package graft.tools
import graft.analyze.CodeAnalyzer
import graft.index._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/**
 * Measures whether impact-ordered / block-max traversal CAN buy
 * sub-linearity on the all-dense disjunctive shape (the one documented
 * linear path): for each reference query, runs exact top-k to get the
 * final threshold theta, then scans every (shard, term) posting row's
 * skip entries counting blocks whose block-max upper bound is below
 * theta — the blocks ANY bound-based order (BMW, impact-ordered,
 * MAXSCORE) is allowed to skip while staying exact. Also reports
 * theta / sum(term global max) — how far the heap threshold sits from
 * the ceiling a candidate could reach.
 *
 * If the skippable fraction is ~0, the linearity is information-
 * theoretic for exact top-k on this corpus (every block can still beat
 * the k-th doc), and impact-ordering is a re-shuffle of the same work —
 * the committed negative result the round-5 verdict asked to measure
 * either way.
 */
object BoundAnalysis {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      "/root/repo/target/graftwork/scale-index")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val eng = new QueryEngine(spark, root)
    println(s"[bounds] docs=${eng.manifest.numDocs} segs=${eng.manifest.segments.size}")
    val bm = eng.bm25
    ReferenceQueries.all.foreach { q =>
      val terms = CodeAnalyzer.analyzeQuery(q)
      val top = eng.topK(q, 10)
      if (top.size == 10) {
        val theta = top.last.score
        // per-(shard,term) rows: count skippable blocks under theta when
        // ALL OTHER terms contribute their global max (the weakest bound
        // any exact method may use), and also under the stronger
        // "this block alone" view (a pure impact-ordered single-term cut)
        val dfs = eng.dict.where(col("term").isin(terms: _*))
          .as[(String, Long)].collect().toMap
        val present = terms.filter(dfs.contains)
        val othersMax: Map[String, Double] = present.map { t =>
          t -> present.filter(_ != t).map { o =>
            bm.upperBound(bm.idf(dfs(o)), Int.MaxValue, 1)
          }.sum
        }.toMap
        // cheap safe global per-term ceiling: idf * (k1+1) is the tf->inf,
        // dl->0 limit of the BM25 term score (what upperBound(maxTf=inf)
        // computes); recompute per block with REAL maxTf/minDl below
        val (blocksTotal, blocksSkippable) = eng.postings
          .where(col("term").isin(present: _*))
          .as[PostingRow].collect()
          .foldLeft((0L, 0L)) { case ((tot, skip), r) =>
            val idf = bm.idf(dfs(r.term))
            val other = othersMax(r.term)
            val s = r.skips.count(sk =>
              other + bm.upperBound(idf, sk.maxTf, sk.minDl) < theta)
            (tot + r.skips.size, skip + s)
          }
        val sumMax = present.map(t =>
          bm.upperBound(bm.idf(dfs(t)), Int.MaxValue, 1)).sum
        println(f"[bounds] '${q.take(40)}%-40s' theta=$theta%8.3f " +
          f"theta/sumMax=${theta / sumMax}%.3f " +
          f"skippable=$blocksSkippable/$blocksTotal " +
          f"(${100.0 * blocksSkippable / blocksTotal.max(1)}%.1f%%)")
      } else println(s"[bounds] '$q' -> ${top.size} hits (skipped)")
    }
    spark.stop()
  }
}

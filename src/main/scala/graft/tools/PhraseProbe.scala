package graft.tools
import graft.index._
import org.apache.spark.sql.SparkSession

/** Re-measure phrase latency on an existing committed index in a fresh
  * JVM (used to attribute in-lifecycle measurements that ran under disk
  * pressure: ScaleSanity's phrase numbers run right after the build+merge
  * filled the page cache with shuffle debris). */
object PhraseProbe {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      "/root/repo/target/graftwork/scale-index")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val eng = new QueryEngine(spark, root)
    println(s"[phrase] docs=${eng.manifest.numDocs} " +
      s"segs=${eng.manifest.segments.size} positions=${eng.hasPositions}")
    ReferenceQueries.phraseQueries.foreach(q => eng.booleanTopK(q, 10)) // warm
    val lats = (1 to 3).flatMap(_ => ReferenceQueries.phraseQueries.map { q =>
      val t0 = System.nanoTime()
      val n = eng.booleanTopK(q, 10).size
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[phrase] '${q.take(44)}%-44s' $s%6.2f s ($n hits)")
      s
    })
    println(f"[phrase] p50=${lats.sorted.apply(lats.size / 2)}%.3f " +
      f"p95=${lats.sorted.apply((lats.size * 95) / 100 min (lats.size - 1))}%.3f")
    // highlight point-lookup cost at this scale (reads one doc's position
    // blocks via skip-advance — must stay ~flat in corpus size)
    val doc = eng.booleanTopK("posting reader", 1).head.docId
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val h = eng.highlight("posting reader segment", doc)
      println(f"[phrase] highlight run$i ${(System.nanoTime() - t0) / 1e9}%5.2f s " +
        s"(${h.map(_.positions.length).sum} positions)")
    }
    spark.stop()
  }
}

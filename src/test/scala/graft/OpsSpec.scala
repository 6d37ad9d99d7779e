package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior tests for the operator families that have no SQL oracle:
  * dedup recall on planted near-duplicates, ANN recall vs brute force,
  * multimodal plumbing, ensemble golden cases. */
class OpsSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"

  // ---- planted near-duplicates for MinHash / SimHash ---------------------

  private lazy val plantedDir: String = {
    import spark.implicits._
    val base = Tables.t(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSeq
    // plant near-dups: copy of doc i with one word changed, id = i + 10000
    val dups = base.take(20).map { case (id, text, lang, src, nc) =>
      val words = text.split(" ")
      words(words.length / 2) = "zzzmutant"
      (id + 10000, words.mkString(" "), lang, src, nc)
    }
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "planted").toString
    (base ++ dups).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("MinHash+LSH finds every planted near-duplicate pair") {
    val cand = DedupOps.minhashCandidates(spark, plantedDir, simThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 20).map(i => (i.toLong, i + 10000L)).toSet
    val missed = expected -- cand
    assert(missed.isEmpty, s"missed planted pairs: $missed")
    // the driver testdata itself contains near-dup pairs (e.g. 474/498,
    // true 3-gram jaccard ~0.99) — those must surface too
    assert(cand.contains((474L, 498L)) && cand.contains((110L, 467L)))
  }

  test("embedding-cosine near-dup finds the planted + natural near-dup pairs") {
    val pairs = DedupOps.qEmbedNearDup(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted one-word mutant survives the two-stage pipeline
    val expected = (0 until 20).map(i => (i.toLong, i + 10000L)).toSet
    val missed = expected -- pairs
    assert(missed.isEmpty, s"missed planted pairs: $missed")
    // the natural near-dups in the driver testdata surface too
    assert(pairs.contains((474L, 498L)) && pairs.contains((110L, 467L)))
    // and unrelated docs don't: candidates stay a tiny fraction of n^2
    assert(pairs.size < 100, s"near-dup set suspiciously large: ${pairs.size}")
  }

  test("SimHash of a near-duplicate is within small Hamming distance") {
    import spark.implicits._
    val sh = DedupOps.qSimHash(spark, plantedDir)
      .as[(Long, Long)].collect().toMap
    (0 until 20).foreach { i =>
      val d = java.lang.Long.bitCount(sh(i.toLong) ^ sh(i + 10000L))
      assert(d <= 12, s"doc $i simhash hamming $d too large")
    }
    // unrelated docs should be far apart on average
    val far = (0 until 20).map(i =>
      java.lang.Long.bitCount(sh(i.toLong) ^ sh(((i + 37) % 400).toLong)))
    assert(far.sum.toDouble / far.size > 15.0)
  }

  test("exact dedup collapses planted EXACT copies") {
    import spark.implicits._
    val docs = Tables.t(spark, sf, "documents").limit(10)
    val dupd = docs.union(docs) // every doc twice
    val groups = dupd.groupBy(sha2(trim(lower(col("text"))), 256))
      .agg(count(lit(1)).as("n")).select("n").as[Long].collect()
    assert(groups.forall(_ == 2L) && groups.length == 10)
  }

  test("ANN LSH bucket candidates contain the true nearest neighbor") {
    // brute-force top-2 (self + nearest); LSH bucket of the query must
    // contain the query itself; recall of top-1 within bucket is best-effort
    val bf = AnnOps.qAnnBruteForce(spark, sf).collect()
    assert(bf.head.getLong(0) === 0L) // self-match first, cos ~ 1
    assert(math.abs(bf.head.getDouble(2) - 1.0) < 1e-6)
    val lsh = AnnOps.qAnnLshTopK(spark, sf).collect()
    assert(lsh.head.getLong(0) === 0L) // query's own bucket contains it
    assert(lsh.length >= 1)
  }

  test("IVF: assignment covers all vectors; probed top-k recalls the true top-1") {
    val assign = AnnOps.qAnnIvfAssign(spark, sf).collect()
    assert(assign.length === 500)
    val nCents = assign.map(_.getLong(1)).distinct.length
    assert(nCents > 1 && nCents <= AnnIndex.IvfCentroids)
    val ivf = AnnOps.qAnnIvfTopK(spark, sf).collect()
    assert(ivf.head.getLong(0) === 0L) // query vector's own list is probed
    // recall vs exact brute force on the top result set
    val bf = AnnOps.qAnnBruteForce(spark, sf).collect().map(_.getLong(0)).toSet
    val got = ivf.map(_.getLong(0)).toSet
    assert((bf intersect got).size >= 5, s"IVF recall too low: $got vs $bf")
  }

  test("IVF/LSH queries read only probed partitions (partition pruning)") {
    def scanPartitionCount(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val root = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case p => p
      }
      val scan = root.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no file scan in plan"))
      (scan.selectedPartitions.partitionCount,
        scan.relation.location.inputFiles.length)
    }
    val (ivfSel, ivfAll) = scanPartitionCount(AnnOps.qAnnIvfTopK(spark, sf))
    assert(ivfSel === AnnIndex.IvfProbes, s"ivf probed $ivfSel partitions")
    assert(ivfAll > ivfSel) // the full table has more cells than the probe set
    val (lshSel, _) = scanPartitionCount(AnnOps.qAnnLshTopK(spark, sf))
    assert(lshSel === 1, s"lsh read $lshSel bucket partitions, wanted 1")
  }

  test("Lloyd-refined IVF build converges and still covers all vectors") {
    import spark.implicits._
    val cents0 = AnnIndex.seedCentroids(spark, sf)
    val cents2 = AnnIndex.lloydRefine(spark, sf, cents0, iters = 2)
    assert(cents2.length === AnnIndex.IvfCentroids)
    // refinement moved at least one centroid (data is not already optimal)
    assert(cents0.zip(cents2).exists { case (a, b) => !a.sameElements(b) })
    // refined assignments still cover every vector, ids in range
    val emb = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("e"))
      .as[(Long, Seq[Double])].collect()
    val ids = emb.map { case (_, e) => AnnIndex.nearestCentroid(e.toArray, cents2) }
    assert(ids.forall(c => c >= 0 && c < AnnIndex.IvfCentroids))
    assert(ids.distinct.length > 1)
  }

  test("embedding norms are positive and stable") {
    val norms = AnnOps.qEmbedNorms(spark, sf).collect().map(_.getDouble(1))
    assert(norms.forall(n => n > 0.0 && !n.isNaN))
  }

  test("sentiment ensemble golden cases (U4 vote, sentiment.py:493-506)") {
    import spark.implicits._
    val rows = Seq(
      (1L, "fast fast small good day"),   // clearly positive
      (2L, "slow slow big big trouble"),  // clearly negative
      (3L, "table scan merge join"))      // neutral (no lexicon hits)
      .toDF("doc_id", "text")
    val out = rows.select(col("doc_id") +: SentimentOps.scored(col("text")): _*)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) === "positive")
    assert(out(2L) === "negative")
    assert(out(3L) === "neutral")
  }

  test("U3 web-scorer vote: a present web label must AGREE or the vote is neutral") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // (tb, vader, web) -> expected label per sentiment.py:493-506
    val rows = Seq(
      (-0.5, -0.3, null.asInstanceOf[String], "negative"), // web off: 2-way
      (-0.5, -0.3, "negative", "negative"),                // web agrees
      (-0.5, -0.3, "positive", "neutral"),                 // web disagrees
      (0.5, 0.3, "positive", "positive"),
      (0.5, 0.3, "neutral", "neutral"),
      (0.1, 0.01, "positive", "neutral"))                  // vader below threshold
      .toDF("tb", "vader", "web", "expected")
    val out = rows.select(col("expected"),
      SentimentOps.voteWithWeb(col("tb"), col("vader"), col("web")).as("got"))
      .collect()
    out.foreach(r => assert(r.getString(1) === r.getString(0)))
  }

  test("multimodal stub decode roundtrips header + batch shape") {
    val out = MultimodalOps.qMediaMeta(spark, sf).collect()
    assert(out.length === 500)
    out.take(20).foreach { r =>
      assert(r.getLong(2) >= 64 && r.getLong(2) < 256) // width
      assert(r.getLong(3) >= 64 && r.getLong(3) < 256) // height
      assert(r.getLong(4) > 12L)                       // header + payload
    }
    val kinds = out.map(_.getString(1)).toSet
    assert(kinds === Set("image", "audio", "video"))
    // feature extraction (byte-level math, not SQL-reachable): determinstic
    // 8-dim vector over payload byte statistics, in [0, 1] per slot
    val m = MultimodalOps.decodeStub(7L, "image",
      MultimodalOps.encodeFake(7L, "image", "payload bytes here".getBytes("UTF-8")))
    assert(m.feature.length === 8)
    assert(m.feature.forall(f => f >= 0.0 && f <= 1.0))
    val m2 = MultimodalOps.decodeStub(7L, "image",
      MultimodalOps.encodeFake(7L, "image", "payload bytes here".getBytes("UTF-8")))
    assert(m.feature === m2.feature)
  }

  test("CorpusGen is deterministic and partition-independent") {
    import spark.implicits._
    val a = graft.corpus.CorpusGen.dataset(spark, 500, 42L, 4).collect()
      .sortBy(d => (d.repo, d.path))
    val b = graft.corpus.CorpusGen.dataset(spark, 500, 42L, 17).collect()
      .sortBy(d => (d.repo, d.path))
    assert(a.toSeq === b.toSeq)
    // hot terms exist (keyword-dense content exercises the salting path)
    val tf = graft.analyze.CodeAnalyzer.termFreqs(a.map(_.content).mkString(" "))._1
    assert(tf("return") > 100 && tf("def") > 100)
  }
}

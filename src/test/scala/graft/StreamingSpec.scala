package graft

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, NaiveIndex, QueryEngine}
import graft.streaming.StreamIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** SURVEY §2.9: streaming ingest (exactly-once micro-batch indexing),
  * watermarked window aggs, bounded dedup, and the text source/sink
  * (S6/S13). */
class StreamingSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val work = Files.createTempDirectory(
    Paths.get("/root/repo/target"), "stream").toString

  test("streaming index ingest: arriving files -> queryable segments, exactly-once") {
    import spark.implicits._
    val src = s"$work/incoming"
    val root = s"$work/stream-index"
    Files.createDirectories(Paths.get(src))
    // two file-arrivals of 200 docs each
    spark.range(0, 200).map(i => CorpusGen.doc(7L, i))
      .coalesce(1).write.mode("append").parquet(src)
    val q1 = StreamIngest.indexStream(spark, src, root, numShards = 4,
      checkpointDir = s"$work/ckpt")
    q1.awaitTermination()
    spark.range(200, 400).map(i => CorpusGen.doc(7L, i))
      .coalesce(1).write.mode("append").parquet(src)
    val q2 = StreamIngest.indexStream(spark, src, root, numShards = 4,
      checkpointDir = s"$work/ckpt")
    q2.awaitTermination()

    val eng = new QueryEngine(spark, root)
    assert(eng.manifest.numDocs === 400L)

    // parity vs oracle over the streamed corpus with engine docIds
    val meta = eng.docmeta.select("docId", "repo", "path", "commit").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2), r.getString(3))))
    val byKey = (0L until 400L).map(i => CorpusGen.doc(7L, i))
      .map(d => (d.repo, d.path, d.commit) -> d.content).toMap
    val oracle = new NaiveIndex(meta.toSeq.map { case (id, k) => (id, byKey(k)) })
    Seq("def return", "computeHashValue", "posting reader segment").foreach { q =>
      val got = eng.topK(q, 10)
      val exp = oracle.topK(q, 10)
      assert(got.map(_.docId) === exp.map(_.docId), s"query '$q'")
      got.zip(exp).foreach { case (g, e) => assert(g.score === e.score) }
    }

    // exactly-once: re-running an already-committed batch id is a no-op
    val before = eng.manifest
    val corpus = spark.range(0, 200).map(i => CorpusGen.doc(7L, i))
    val r = IndexBuilder.build(spark, corpus, root, 4, batch = 1, resume = false)
    assert(r.builtShards.isEmpty && r.manifest.numDocs === before.numDocs)
  }

  test("streaming ANN ingest: arriving embedding batches grow the committed store exactly-once") {
    val sf = "/root/testdata/sf0.001"
    val ds = s"$work/ann-dataset"
    val src = s"$work/ann-incoming"
    val ckpt = s"$work/ann-ckpt"
    Files.createDirectories(Paths.get(src))
    val emb = graft.ops.Tables.t(spark, sf, "embeddings")
    emb.where(col("vec_id") < 100)
      .coalesce(1).write.mode("overwrite").parquet(s"$ds/embeddings.parquet")
    graft.ops.AnnIndex.ensure(spark, ds)

    emb.where(col("vec_id") >= 100 && col("vec_id") < 150)
      .coalesce(1).write.mode("append").parquet(src)
    StreamIngest.annStream(spark, src, ds, ckpt).awaitTermination()
    assert(graft.ops.AnnOps.qAnnLshBuckets(spark, ds).count() === 150L)

    // second arrival through the same checkpoint
    emb.where(col("vec_id") >= 150 && col("vec_id") < 180)
      .coalesce(1).write.mode("append").parquet(src)
    StreamIngest.annStream(spark, src, ds, ckpt).awaitTermination()
    assert(graft.ops.AnnOps.qAnnLshBuckets(spark, ds).count() === 180L)
    assert(graft.ops.AnnOps.qAnnIvfAssign(spark, ds).count() === 180L)

    // exactly-once both ways: a restart with nothing new is a no-op
    // (checkpoint), and a manual re-delivery of a committed batch id
    // no-ops through the store's lineage
    StreamIngest.annStream(spark, src, ds, ckpt).awaitTermination()
    assert(graft.ops.AnnOps.qAnnLshBuckets(spark, ds).count() === 180L)
    val redelivered = emb.where(col("vec_id") >= 100 && col("vec_id") < 150)
    assert(!graft.ops.AnnIndex.append(spark, ds, redelivered, batchId = 1))
  }

  test("watermarked 30s window counts over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF.toDF("ts", "event_type")
    val q = StreamIngest.windowedCounts(df)
      .writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((t("2024-01-01 00:00:05"), "click"), (t("2024-01-01 00:00:25"), "click"),
      (t("2024-01-01 00:00:35"), "view"), (t("2024-01-01 00:01:02"), "click"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM wc ORDER BY bucket, event_type").collect()
    q.stop()
    assert(rows.map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSeq ===
      Seq(("2024-01-01 00:00:00.0", "click", 2L),
          ("2024-01-01 00:00:30.0", "view", 1L),
          ("2024-01-01 00:01:00.0", "click", 1L)))
  }

  test("bounded-state streaming dedup by sha256 (W4)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF.toDF("ingest_ts", "content")
    val q = StreamIngest.dedupStream(df)
      .writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((t("2024-01-01 00:00:01"), "alpha"), (t("2024-01-01 00:00:02"), "alpha"),
      (t("2024-01-01 00:00:03"), "beta"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 00:01:00"), "alpha"), (t("2024-01-01 00:01:01"), "gamma"))
    q.processAllAvailable()
    val contents = spark.sql("SELECT content FROM dd").collect().map(_.getString(0)).sorted
    q.stop()
    // alpha deduped within the watermark: 1 alpha, 1 beta, 1 gamma
    assert(contents.toSeq === Seq("alpha", "beta", "gamma"))
  }

  test("match() filters a structured stream (row-eval — a stream has no index yet)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    implicit val sqlCtx = spark.sqlContext
    graft.GraftSql.ensureMatchSupport(spark)
    val mem = MemoryStream[(Long, String)]
    // the keyword gate of an ingest pipeline: keep docs matching the
    // boolean query before they reach the index; streaming relations
    // are not parquet scans, so the rewrite correctly stays off and the
    // row-level predicate runs inside the micro-batch
    val q = mem.toDF.toDF("id", "content")
      .where(expr("match(content, 'spark query, merge join')"))
      .writeStream.format("memory").queryName("mf")
      .outputMode("append").start()
    mem.addData(
      (1L, "spark query planner"),        // group 1 matches
      (2L, "spark only"),                 // neither group complete
      (3L, "a merge join strategy"),      // group 2 matches
      (4L, "mergeJoin camel stays whole"), // analyzer splits: matches g2
      (5L, ""))
    q.processAllAvailable()
    val kept = spark.sql("SELECT id FROM mf").collect().map(_.getLong(0)).sorted
    q.stop()
    assert(kept.toSeq === Seq(1L, 3L, 4L))
  }

  test("S6/S13 user-id text source/sink roundtrip") {
    import spark.implicits._
    val p = s"$work/userids"
    Seq("123", "456", "789").toDF("id").coalesce(1).write.mode("overwrite").text(p)
    val back = spark.read.text(p).select(col("value").cast("long").as("id"))
      .as[Long].collect().sorted
    assert(back.toSeq === Seq(123L, 456L, 789L))
  }
}

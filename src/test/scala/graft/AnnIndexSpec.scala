package graft

import graft.ops.{AnnIndex, AnnOps, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

/** Durability contract of the materialized ANN stores: built once,
  * committed behind the snapshot protocol, REOPENED (not rebuilt) by
  * later opens; content-fingerprinted roots so a regenerated dataset
  * rebuilds instead of serving stale buckets. */
class AnnIndexSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"

  private def snap(f: java.io.File): Seq[(String, Long, Long)] =
    if (f.isDirectory) f.listFiles().sortBy(_.getName).toSeq.flatMap(snap)
    else Seq((f.getPath, f.length, f.lastModified))

  test("committed ANN store is reopened, never rebuilt: no jobs, no file churn, same results") {
    val p1 = AnnIndex.ensure(spark, sf)
    assert(new graft.table.IcebergLite(p1.root).exists,
      "build must commit a snapshot")
    val lsh1 = AnnOps.qAnnLshTopK(spark, sf).collect().toSeq
    val ivf1 = AnnOps.qAnnIvfTopK(spark, sf).collect().toSeq
    val before = snap(new java.io.File(p1.root))

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val p2 =
      try {
        val p = AnnIndex.ensure(spark, sf)
        Thread.sleep(500) // listener events are posted asynchronously
        p
      } finally spark.sparkContext.removeSparkListener(listener)

    assert(p2.root == p1.root, "same content must resolve to the same root")
    assert(jobs.get() == 0, "reopening a committed store must launch no Spark jobs")
    assert(snap(new java.io.File(p1.root)) == before,
      "reopen must not rewrite any store file")
    assert(AnnOps.qAnnLshTopK(spark, sf).collect().toSeq == lsh1)
    assert(AnnOps.qAnnIvfTopK(spark, sf).collect().toSeq == ivf1)
  }

  test("manifest records the three store segments with row metrics") {
    val p = AnnIndex.ensure(spark, sf)
    val m = new graft.table.IcebergLite(p.root).currentManifest().get
    assert(m.segments.map(_.name).sorted == Seq("centroids", "ivf", "lsh"))
    val lsh = m.segments.find(_.name == "lsh").get
    assert(lsh.metrics.docs == Tables.t(spark, sf, "embeddings").count())
    assert(lsh.lineage("source") == sf)
    assert(m.segments.find(_.name == "centroids").get.metrics.docs ==
      AnnIndex.IvfCentroids.toLong)
  }

  test("regenerated dataset at the same path gets a fresh fingerprinted root") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "annfp").toString
    val src = Tables.t(spark, sf, "embeddings").limit(64)
    src.coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val root1 = AnnIndex.rootFor(dir)
    AnnIndex.ensure(spark, dir)
    assert(new graft.table.IcebergLite(root1).exists)

    Thread.sleep(1100) // parquet mtime granularity can be 1s
    // regenerate in place: different rows => different content
    Tables.t(spark, sf, "embeddings").limit(32).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val root2 = AnnIndex.rootFor(dir)
    assert(root2 != root1,
      "fingerprint must change when the dataset is regenerated in place")
    val p2 = AnnIndex.ensure(spark, dir)
    assert(p2.root == root2)
    assert(spark.read.parquet(p2.lsh).count() == 32,
      "the fresh store must index the regenerated data, not the stale one")
    // the superseded store for the SAME dataset dir is swept (a corpus-
    // sized copy per regeneration would otherwise leak forever)
    assert(!new java.io.File(root1).exists(),
      "stale store for the regenerated dataset must be deleted")
  }

  test("a crashed (uncommitted) build is cleared and rebuilt on the next ensure") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "anncrash").toString
    Tables.t(spark, sf, "embeddings").limit(48).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val root = AnnIndex.rootFor(dir)
    // simulate a crash: partial store files on disk, NO snapshot commit
    new java.io.File(s"$root/lsh").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/lsh/garbage.parquet"), "not parquet")
    val p = AnnIndex.ensure(spark, dir)
    assert(new graft.table.IcebergLite(p.root).exists)
    assert(spark.read.parquet(p.lsh).count() == 48)
  }
}

package graft.ops

import graft.table.{IcebergLite, Manifest, SegmentInfo, SegmentMetrics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Materialized ANN index structures over the `embeddings` table — built
 * ONCE per dataset, COMMITTED behind the IcebergLite snapshot protocol,
 * and REOPENED (a metadata stat) by every later session, in-process or
 * across restarts. That is the 100 TB contract: one store build, many
 * opens — the same pattern as SearchOps.docEngine. The root embeds the
 * store FormatVersion and a content fingerprint of the source table, so
 * a regenerated dataset or a changed store format rebuilds while an
 * identical corpus always reopens; a crash mid-build leaves no
 * snapshot.json, so the next ensure() clears the debris and rebuilds.
 *
 * Layout under workDir/ann-f<ver>-<sha12(dir+fingerprint)>-r<iters>/:
 *   snapshot.json + manifest-1.json  (IcebergLite commit: three segments
 *                                     named lsh/ivf/centroids, with row
 *                                     metrics + build lineage)
 *   lsh/bucket6=<b>/...parquet       (vec_id, label, embedding, bucket16)
 *   ivf/centroid=<c>/...parquet      (vec_id, label, embedding)
 *   centroids/...parquet             (centroid, embedding)
 *
 * Both data tables are PARTITIONED BY their probe key, so a query reads
 * only the probed partitions (partition pruning visible in the plan) and
 * never scans the full vector set. At 10^12 vectors this is the standard
 * IVF/LSH store shape: the vectors are duplicated into their cell.
 *
 * Determinism/portability: LSH planes come from splitmix64(p,d) and the
 * IVF coarse quantizer uses SEED CENTROIDS (the embeddings of
 * vec_id < IvfCentroids) — both reproducible in plain SQL, so the DuckDB
 * oracle verifies the materialized tables bit-for-bit. Lloyd refinement
 * of the centroids (lloydRefine) is available as a build-time quality
 * knob (spec-tested); the oracled default keeps refineIters = 0.
 */
object AnnIndex {
  import Tables._

  /** ANN store FORMAT version: bump when planes/quantizer/layout
    * semantics change, so stores built by an older engine are rebuilt
    * instead of reopened (the root embeds it). */
  val FormatVersion = "1"

  val NumPlanes = 16
  val Dim = 64
  val IvfCentroids = 16
  val IvfProbes = 4
  /** LSH probe count: the query's own bucket6 plus (LshProbes-1)
    * Hamming-adjacent codes, flipping the planes with the smallest
    * |margin| first — the LSH equivalent of the IvfProbes recall dial. */
  val LshProbes = 4
  /** lsh partition key: low 6 bits of the 16-bit bucket (64 partitions;
    * at scale use more planes/partitions — same mechanism). */
  val Bucket6Mask = 0x3f
  /** Plane count of the partition key — every probe-code computation
    * (Scala AND the generated oracles) derives from this, so widening
    * the mask updates them all in lockstep. */
  val Bucket6Bits: Int = java.lang.Integer.bitCount(Bucket6Mask)

  /** Deterministic pseudo-random hyperplane weight (plane p, dim d) in
    * [-1, 1] — splitmix64 on (p, d), public-domain mixer. Embedded as
    * literals into the DuckDB oracle SQL. */
  def planeWeight(p: Int, d: Int): Double = {
    var z = (p.toLong << 32 | d.toLong) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  val Planes: Array[Array[Double]] =
    Array.tabulate(NumPlanes, Dim)((p, d) => planeWeight(p, d))

  /** 16-bit sign-random-projection bucket. Sequential sum order (frozen:
    * the oracle's list_reduce folds left in the same order). */
  def lshBucket16(emb: Seq[Float]): Int = {
    var bucket = 0
    var p = 0
    while (p < NumPlanes) {
      var s = 0.0
      var d = 0
      val n = math.min(emb.length, Dim)
      while (d < n) { s += Planes(p)(d) * emb(d); d += 1 }
      if (s > 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** Index of the nearest centroid by squared L2, ties to the lowest id
    * (strict <); sequential accumulation order, matching the oracle. */
  def nearestCentroid(e: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var i = 0
      val cv = cents(c)
      val n = math.min(e.length, cv.length)
      while (i < n) { val x = e(i) - cv(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Seed centroids: the embeddings of vec_id < IvfCentroids (as doubles),
    * index == vec_id. SQL-expressible, hence oracle-verifiable. */
  def seedCentroids(spark: SparkSession, dir: String): Array[Array[Double]] = {
    import spark.implicits._
    t(spark, dir, "embeddings")
      .where(col("vec_id") < IvfCentroids)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
  }

  /** Optional Lloyd refinement (k-means): each round is one broadcast
    * assign + reduceByKey average — the textbook scale shape, run at
    * BUILD time only (never per query). Not part of the oracled default. */
  def lloydRefine(spark: SparkSession, dir: String,
                  init: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      .as[(Long, Seq[Double])]
    var cents = init
    (1 to iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(cents)
      val next = emb.map { case (_, e) =>
        (nearestCentroid(e.toArray, bc.value), (e.toArray, 1L))
      }.rdd.reduceByKey { (x: (Array[Double], Long), y: (Array[Double], Long)) =>
        val s = new Array[Double](x._1.length)
        var d = 0
        while (d < s.length) { s(d) = x._1(d) + y._1(d); d += 1 }
        (s, x._2 + y._2)
      }.collect().toMap
      cents = cents.zipWithIndex.map { case (old, c) =>
        next.get(c).map { case (s, n) => s.map(_ / n) }.getOrElse(old)
      }
    }
    cents
  }

  final case class AnnPaths(root: String) {
    def lsh: String = s"$root/lsh"
    def ivf: String = s"$root/ivf"
    def centroids: String = s"$root/centroids"
  }

  /** The committed store root for a dataset dir: format version +
    * content fingerprint + build parameters, all in the path (the
    * docEngine scheme — a regenerated dataset changes the root). */
  def rootFor(dir: String, refineIters: Int = 0): String =
    s"${SearchOps.workDir}/ann-f$FormatVersion-${
      graft.index.IndexBuilder.sha256Hex(dir + "|" +
        Tables.contentFingerprint(s"$dir/embeddings.parquet")).take(12)}-r$refineIters"

  /** Open the committed ANN store for a dataset dir, building it first
    * iff no committed snapshot covers this exact (content, format,
    * params) triple. Reopen is a single file stat — no Spark jobs, no
    * writes; only a missing/uncommitted root triggers the build (one
    * pass over embeddings per structure, writes partitioned by probe
    * key, then an atomic snapshot commit). */
  def ensure(spark: SparkSession, dir: String,
             refineIters: Int = 0): AnnPaths = synchronized {
    import spark.implicits._
    val root = rootFor(dir, refineIters)
    val tbl = new IcebergLite(root)
    val paths = AnnPaths(root)
    if (tbl.exists) return paths // REOPEN: committed store, metadata only
    // no snapshot => never committed; clear any crash debris and build
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val emb = t(spark, dir, "embeddings")

    // LSH store: (vec_id, label, embedding, bucket16) partitioned by
    // bucket6; row metrics ride the write job via observe() (no extra pass)
    val lshObs = org.apache.spark.sql.Observation(s"ann-lsh-$root")
    emb.select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Seq[Float])]
      .map { case (id, label, e) =>
        val b = lshBucket16(e)
        (id, label, e, b.toLong, (b & Bucket6Mask).toLong)
      }
      .toDF("vec_id", "label", "embedding", "bucket16", "bucket6")
      .observe(lshObs, count(lit(1)).as("rows"))
      .repartition(col("bucket6"))
      .write.partitionBy("bucket6").mode("overwrite").parquet(paths.lsh)

    // IVF store: (vec_id, label, embedding) partitioned by centroid
    val cents0 = seedCentroids(spark, dir)
    val cents = if (refineIters > 0) lloydRefine(spark, dir, cents0, refineIters)
                else cents0
    val bc = spark.sparkContext.broadcast(cents)
    emb.select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Seq[Float])]
      .map { case (id, label, e) =>
        val c = nearestCentroid(e.map(_.toDouble).toArray, bc.value)
        (id, label, e, c.toLong)
      }
      .toDF("vec_id", "label", "embedding", "centroid")
      .repartition(col("centroid"))
      .write.partitionBy("centroid").mode("overwrite").parquet(paths.ivf)

    cents.zipWithIndex
      .map { case (e, c) => (c.toLong, e.toSeq) }.toSeq
      .toDF("centroid", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(paths.centroids)

    // atomic snapshot commit: reopenable from any later session/process
    val nVec = lshObs.get("rows").asInstanceOf[Long]
    val lineage = Map("source" -> dir, "format" -> FormatVersion)
    tbl.commit(Manifest(version = 1, numShards = Bucket6Mask + 1,
      segments = Seq(
        SegmentInfo(0, "lsh", Nil, SegmentMetrics(nVec, 0, nVec, 0),
          lineage + ("kind" -> "lsh-sign-rp", "planes" -> NumPlanes.toString,
            "partitionKey" -> "bucket6")),
        SegmentInfo(1, "ivf", Nil, SegmentMetrics(nVec, 0, nVec, 0),
          lineage + ("kind" -> "ivf", "cells" -> IvfCentroids.toString,
            "refineIters" -> refineIters.toString, "partitionKey" -> "centroid")),
        SegmentInfo(2, "centroids", Nil,
          SegmentMetrics(cents.length.toLong, 0, cents.length.toLong, 0),
          lineage + ("kind" -> "quantizer"))),
      numDocs = nVec, totalTokens = 0L))

    // sweep SUPERSEDED stores of this same dataset dir: each in-place
    // regeneration mints a fresh fingerprinted root, and the stores are
    // corpus-sized (vectors duplicated into their cells) — without this
    // every regeneration would leak a full copy forever. Retention
    // contract: committing a new store for a source dir invalidates
    // readers still pinned to its stale-content stores (same horizon
    // policy as IcebergLite.gc).
    val work = new java.io.File(SearchOps.workDir)
    Option(work.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.getName.startsWith("ann-") && f.getPath != root) {
        val supersedes =
          try new IcebergLite(f.getPath).currentManifest()
            .exists(_.segments.exists(_.lineage.get("source").contains(dir)))
          catch { case _: Exception => false } // foreign/corrupt: leave it
        if (supersedes) org.apache.commons.io.FileUtils.deleteQuietly(f)
      }
    }
    paths
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/**
 * Materialized ANN index structures over the `embeddings` table — built
 * ONCE per dataset, queried many times (the round-1 plans recomputed
 * buckets/centroids per query: correct math, wrong shape at 100 TB).
 *
 * Layout under workDir/ann-<sha12(dir)>/:
 *   lsh/bucket6=<b>/...parquet   (vec_id, label, embedding, bucket16)
 *   ivf/centroid=<c>/...parquet  (vec_id, label, embedding)
 *   centroids/...parquet         (centroid, embedding)
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

  val NumPlanes = 16
  val Dim = 64
  val IvfCentroids = 16
  val IvfProbes = 4
  /** lsh partition key: low 6 bits of the 16-bit bucket (64 partitions;
    * at scale use more planes/partitions — same mechanism). */
  val Bucket6Mask = 0x3f

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

  private val cache = mutable.HashMap.empty[String, AnnPaths]

  /** Build (or reuse, per JVM) the materialized ANN index for a dataset
    * dir. One pass over embeddings per structure; both writes are
    * partitioned by their probe key. */
  def ensure(spark: SparkSession, dir: String,
             refineIters: Int = 0): AnnPaths = synchronized {
    cache.getOrElseUpdate(dir + s"#$refineIters", {
      import spark.implicits._
      val root = s"${SearchOps.workDir}/ann-${
        graft.index.IndexBuilder.sha256Hex(dir).take(12)}-r$refineIters"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val paths = AnnPaths(root)
      val emb = t(spark, dir, "embeddings")

      // LSH store: (vec_id, label, embedding, bucket16) partitioned by bucket6
      emb.select(col("vec_id"), col("label"), col("embedding"))
        .as[(Long, Int, Seq[Float])]
        .map { case (id, label, e) =>
          val b = lshBucket16(e)
          (id, label, e, b.toLong, (b & Bucket6Mask).toLong)
        }
        .toDF("vec_id", "label", "embedding", "bucket16", "bucket6")
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
      paths
    })
  }
}

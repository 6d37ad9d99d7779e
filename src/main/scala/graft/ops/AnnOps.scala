package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table (vec_id, embedding:
 * array<float>[64], label). Brute-force cosine top-k as the exact
 * baseline (pure `aggregate`/`zip_with` expressions — codegen'd, no UDF,
 * trivially parallel: score is a map, top-k is TakeOrdered), plus a
 * random-hyperplane LSH bucketing as the scale path (candidates only ever
 * meet inside a bucket).
 */
object AnnOps {
  import Tables._

  /** Cast to double once; all math in doubles (matches the DuckDB oracle). */
  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  /** Exact brute-force cosine top-10 vs the vec_id=0 query vector. */
  def qAnnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val e = asDouble(col("embedding"))
    // query vector as a correlated scalar: broadcast single-row cross join
    val qv = emb.where(col("vec_id") === 0)
      .select(asDouble(col("embedding")).as("qv"))
    emb.crossJoin(broadcast(qv))
      .select(col("vec_id"), col("label"),
        round(cosine(e, col("qv")), 6).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(10)
  }

  /** Vector norms + global norm stats (sanity surface, SQL-oracled). */
  def qEmbedNorms(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), round(l2(asDouble(col("embedding"))), 6).as("norm"))
      .orderBy("vec_id")

  val NumPlanes = 16

  /** Deterministic pseudo-random hyperplane weight (plane p, dim d) in
    * [-1, 1] — splitmix64 on (p, d), public-domain mixer. */
  def planeWeight(p: Int, d: Int): Double = {
    var z = (p.toLong << 32 | d.toLong) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** Sign-random-projection LSH: 16-bit bucket per vector. Typed map
    * with the plane matrix in the closure (per-row scalar). */
  def qAnnLshBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planes: Array[Array[Double]] =
      Array.tabulate(NumPlanes, 64)((p, d) => planeWeight(p, d))
    t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, emb) =>
        var bucket = 0
        var p = 0
        while (p < planes.length) {
          var s = 0.0
          var d = 0
          while (d < emb.length && d < 64) { s += planes(p)(d) * emb(d); d += 1 }
          if (s > 0) bucket |= (1 << p)
          p += 1
        }
        (id, bucket)
      }
      .toDF("vec_id", "bucket")
      .orderBy("vec_id")
  }

  val IvfCentroids = 16
  val IvfProbes = 4
  val IvfIters = 3

  /** IVF coarse quantizer: deterministic k-means (centroids seeded from
    * the first k vectors by vec_id, `IvfIters` Lloyd rounds computed as
    * DataFrame aggregations — each round is one broadcast-assign +
    * groupBy-average, the textbook scale shape). Returns the centroid
    * matrix. At 100 TB the same two jobs run over a sample. */
  def ivfCentroids(spark: SparkSession, dir: String): Array[Array[Double]] = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .as[(Long, Seq[Double])]
    var cents: Array[Array[Double]] = emb
      .filter(_._1 < IvfCentroids).collect().sortBy(_._1)
      .map(_._2.toArray)
    (1 to IvfIters).foreach { _ =>
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

  def nearestCentroid(e: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var i = 0
      val cv = cents(c)
      while (i < e.length && i < cv.length) {
        val x = e(i) - cv(i); d += x * x; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** IVF assignment table: (vec_id, centroid). The inverted-file lists. */
  def qAnnIvfAssign(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = ivfCentroids(spark, dir)
    val bc = spark.sparkContext.broadcast(cents)
    t(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .as[(Long, Seq[Double])]
      .map { case (id, e) => (id, nearestCentroid(e.toArray, bc.value)) }
      .toDF("vec_id", "centroid")
      .orderBy("vec_id")
  }

  /** IVF top-k: probe the query's `IvfProbes` nearest inverted lists,
    * exact cosine only inside them — the standard recall/cost dial. */
  def qAnnIvfTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = ivfCentroids(spark, dir)
    val emb = t(spark, dir, "embeddings")
    val qv = emb.where(col("vec_id") === 0)
      .select(asDouble(col("embedding"))).as[Seq[Double]].head().toArray
    val probed: Seq[Int] = cents.indices
      .sortBy { c =>
        var d = 0.0; var i = 0
        while (i < qv.length) { val x = qv(i) - cents(c)(i); d += x * x; i += 1 }
        d
      }.take(IvfProbes)
    val assign = qAnnIvfAssign(spark, dir)
    emb.join(assign, "vec_id")
      .where(col("centroid").isin(probed.map(Integer.valueOf): _*))
      .crossJoin(broadcast(emb.where(col("vec_id") === 0)
        .select(asDouble(col("embedding")).as("qv"))))
      .select(col("vec_id"), round(cosine(asDouble(col("embedding")), col("qv")), 6).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(10)
  }

  /** Bucketed ANN: exact cosine only among candidates whose coarse
    * 6-bit LSH bucket matches the query's (multi-resolution probing —
    * the 100 TB path: candidates shrink by the bucket fan-out, the
    * cosine is only evaluated inside the bucket). Top-10 of the bucket. */
  def qAnnLshTopK(spark: SparkSession, dir: String): DataFrame = {
    val buckets = qAnnLshBuckets(spark, dir)
      .select(col("vec_id"), (col("bucket").bitwiseAND(lit(0x3f))).as("bucket"))
    val emb = t(spark, dir, "embeddings").join(buckets, "vec_id")
    val qRow = emb.where(col("vec_id") === 0)
      .select(asDouble(col("embedding")).as("qv"), col("bucket").as("qbucket"))
    emb.crossJoin(broadcast(qRow))
      .where(col("bucket") === col("qbucket"))
      .select(col("vec_id"), round(cosine(asDouble(col("embedding")), col("qv")), 6).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(10)
  }
}

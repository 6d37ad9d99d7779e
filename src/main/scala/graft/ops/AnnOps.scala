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

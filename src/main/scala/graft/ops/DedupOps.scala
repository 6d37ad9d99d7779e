package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for a large-scale training-data pipeline, over
 * the `documents` table. All the heavy lifting stays in codegen'd column
 * expressions (no UDFs): shingling via slice/transform, MinHash via
 * xxhash64 over a seed sequence, banding via explode — so the plan is a
 * scan -> project -> (optional) shuffle, exactly what survives a 100x
 * scale-up. Candidate-pair generation only ever joins on band buckets
 * (LSH) or capped-df shingles, never all-pairs.
 */
object DedupOps {
  import Tables._

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand = 4 // Bands * RowsPerBand == NumHashes
  val ShingleSize = 3

  /** 64-bit hashes of the word 3-gram shingles, computed in ONE pass with
    * O(1) element_at lookups (building shingle strings via slice/concat
    * is O(n^2) per doc and was 1000x slower at 5k docs — measured). */
  def shingleHashes(text: Column): Column = {
    val tk = toks(text)
    when(size(tk) >= ShingleSize,
      transform(sequence(lit(1), size(tk) - (ShingleSize - 1)),
        j => xxhash64(element_at(tk, j), element_at(tk, j + 1),
          element_at(tk, j + 2))))
      .otherwise(array(xxhash64(concat_ws(" ", tk))))
  }

  /** (doc_id, sig) via the native MinHashSig Catalyst expression
    * (graft.functions.MinHashSig) — one tight pass per row; the pure
    * aggregate/zip_with formulation allocated a 64-slot array per
    * shingle and was ~80x slower (measured at sf0.1). */
  def sigsDF(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.MinHashFunctions.register(spark)
    t(spark, dir, "documents")
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .selectExpr("doc_id", "minhash_sig(tk) AS sig")
  }

  /** Exact dedup: group by content hash, keep lowest doc_id (F4/F5 —
    * the reference's tweet_id / headline dedup lists,
    * /root/reference/sentiment.py:158,281). */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(sha2(trim(lower(col("text"))), 256).as("content_sha"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  /** MinHash signatures (first 8 slots projected for inspection). */
  def qMinHashSigs(spark: SparkSession, dir: String): DataFrame =
    sigsDF(spark, dir)
      .select(col("doc_id") +: (0 until 8).map(i => col("sig")(i).as(s"h$i")): _*)
      .orderBy("doc_id")

  /** LSH banding: (doc_id, band, bucket); near-dup candidates are pairs
    * sharing a bucket — the scale path (bucket join, never all-pairs). */
  def qMinHashBands(spark: SparkSession, dir: String): DataFrame =
    sigsDF(spark, dir)
      .select(col("doc_id"), explode(sequence(lit(0), lit(Bands - 1))).as("band"),
        col("sig"))
      .select(col("doc_id"), col("band"),
        xxhash64(col("band"), concat_ws("_",
          transform(slice(col("sig"), col("band") * RowsPerBand + 1, lit(RowsPerBand)),
            x => x.cast("string")))).as("bucket"))
      .orderBy("doc_id", "band")

  /** Candidate pairs from LSH buckets with verified MinHash similarity. */
  def minhashCandidates(spark: SparkSession, dir: String,
                        simThreshold: Double): DataFrame = {
    val sigs = sigsDF(spark, dir)
    val bands = sigs
      .select(col("doc_id"), explode(sequence(lit(0), lit(Bands - 1))).as("band"),
        col("sig"))
      .select(col("doc_id"), col("band"),
        xxhash64(col("band"), concat_ws("_",
          transform(slice(col("sig"), col("band") * RowsPerBand + 1, lit(RowsPerBand)),
            x => x.cast("string")))).as("bucket"))
    val a = bands.select(col("band"), col("bucket"), col("doc_id").as("a"))
    val b = bands.select(col("band"), col("bucket"), col("doc_id").as("b"))
    val cand = a.join(b, Seq("band", "bucket")).where(col("a") < col("b"))
      .select("a", "b").distinct()
    val sa = sigs.select(col("doc_id").as("a"), col("sig").as("sig_a"))
    val sb = sigs.select(col("doc_id").as("b"), col("sig").as("sig_b"))
    cand.join(sa, "a").join(sb, "b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          when(x === y, 1).otherwise(0)), v => v === 1)).cast("double") / NumHashes)
      .where(col("est_jaccard") >= simThreshold)
      .select("a", "b", "est_jaccard")
      .orderBy("a", "b")
  }

  /** Registered near-dup query: LSH candidate pairs with MinHash-estimated
    * jaccard >= 0.8 (the driver testdata contains genuine near-dup pairs). */
  def qMinHashPairs(spark: SparkSession, dir: String): DataFrame =
    minhashCandidates(spark, dir, simThreshold = 0.8)
      .select(col("a"), col("b"), round(col("est_jaccard"), 4).as("est_jaccard"))

  /** SimHash (64-bit) per document: tf-weighted sign aggregation of
    * token hashes. Typed map (per-row scalar; Expression candidate). */
  def qSimHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .as[(Long, Seq[String])]
      .map { case (id, tk) => (id, simhash64(tk)) }
      .toDF("doc_id", "simhash")
      .orderBy("doc_id")
  }

  def simhash64(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    val tf = tokens.groupBy(identity).view.mapValues(_.size)
    tf.foreach { case (tok, f) =>
      var h = tok.hashCode.toLong * 0x9e3779b97f4a7c15L
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      h = h ^ (h >>> 31)
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) == 1L) acc(b) += f else acc(b) -= f
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Hamming distance between simhashes of consecutive doc pairs — a
    * cheap near-dup screen (top-20 most similar pairs by LSH-free
    * small-scale scan would be O(n^2); at scale, bucket simhash prefixes.
    * Here: distribution of prefix-bucket sizes, deterministic). */
  def qSimHashBuckets(spark: SparkSession, dir: String): DataFrame =
    qSimHash(spark, dir)
      .select((col("simhash").bitwiseAND(lit(0xffffL))).as("prefix16"))
      .groupBy("prefix16").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("prefix16"))
      .limit(50)

  /** n-gram Jaccard similarity: top-20 candidate pairs by true Jaccard
    * over 3-word shingles. Pair generation via shingle inverted join
    * with a df cap (ultra-common shingles dropped — documented coverage
    * cap; at 100 TB this is the standard anti-blowup guard). */
  def qNgramJaccardTop(spark: SparkSession, dir: String): DataFrame = {
    val docShingles = t(spark, dir, "documents")
      .select(col("doc_id"), explode(shingleHashes(col("text"))).as("sh"))
      .distinct()
    val sizes = docShingles.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val rare = docShingles.join(
      docShingles.groupBy("sh").agg(count(lit(1)).as("df")).where(col("df") <= 50),
      "sh")
    val pairs = rare.select(col("sh"), col("doc_id").as("a"))
      .join(rare.select(col("sh"), col("doc_id").as("b")), "sh")
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("nb")), "b")
      .select(col("a"), col("b"),
        round(col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")), 6).as("jaccard"))
      .orderBy(desc("jaccard"), asc("a"), asc("b"))
      .limit(20)
  }
}

package graft.ops

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/**
 * Deduplication operators for a large-scale training-data pipeline, over
 * the `documents` table. All the heavy lifting stays in codegen'd column
 * expressions or native Catalyst expressions (no UDFs): shingling via
 * transform/element_at, MinHash/SimHash via graft.functions.{MinHashSig,
 * SimHash64} — so the plan is scan -> project -> (optional) shuffle,
 * exactly what survives a 100x scale-up. Candidate-pair generation only
 * ever joins on band buckets (LSH) or capped-df shingles, never all-pairs.
 *
 * Every signature here uses the PORTABLE md5-hex60 hash scheme
 * (graft.functions.PortableHash), so each query has an exact DuckDB
 * oracle (`oracles` below) — the whole family is hash-verified
 * end-to-end, not just spec-tested.
 */
object DedupOps {
  import Tables._

  val NumHashes = PortableHash.NumHashes
  val Bands = 16
  val RowsPerBand = 4 // Bands * RowsPerBand == NumHashes
  val ShingleSize = 3
  /** Shingles present in more than DfCap docs are dropped from n-gram
    * Jaccard pair generation (anti-blowup guard); the dropped volume is
    * REPORTED by qNgramCapMetrics (q47), not silently truncated. */
  val DfCap = 50

  /** LSH band buckets holding more than this many docs are dropped from
    * candidate-pair generation: pairs within a bucket are O(|bucket|²),
    * and a real corpus's boilerplate cluster (N identical docs → one
    * shared signature) would otherwise go quadratic in the self-join.
    * True duplicates are the exact-dedup path's job (q40); the dropped
    * volume is REPORTED by qBandCapMetrics (q49) — the same
    * cap-as-output treatment the shingle path gets from q47. */
  val BandBucketCap = 32

  /** Word 3-gram shingle strings, built in one O(n) pass (element_at is
    * O(1); building via slice/concat was O(n^2) per doc — measured). */
  def shingleStrs(text: Column): Column = {
    val tk = toks(text)
    when(size(tk) >= ShingleSize,
      transform(sequence(lit(1), size(tk) - (ShingleSize - 1)),
        j => concat_ws(" ", element_at(tk, j), element_at(tk, j + 1),
          element_at(tk, j + 2))))
      .otherwise(array(concat_ws(" ", tk)))
  }

  /** Portable 60-bit shingle keys: conv(substr(md5(s),1,15),16,10) ==
    * DuckDB ('0x' || substr(md5(s),1,15))::BIGINT. Pure built-ins. */
  def shingleKeys(text: Column): Column =
    transform(shingleStrs(text),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))

  /** (doc_id, sig) via the native MinHashSig Catalyst expression — one
    * tight pass per row (the pure aggregate/zip_with formulation was ~80x
    * slower at sf0.1, and CollapseProject re-evaluates projected arrays
    * once per lambda use — measured; see MinHashSig scaladoc). Persisted
    * per dataset dir: q41/q42/q46 and the candidate join all reuse ONE
    * signature pass (q46's plan otherwise recomputes it three times). */
  private val sigCache = mutable.HashMap.empty[String, DataFrame]
  def sigsDF(spark: SparkSession, dir: String): DataFrame = synchronized {
    evictDeadSessions(sigCache, spark)
    sigCache.getOrElseUpdate(sessionCacheKey(spark, dir), {
      graft.functions.MinHashFunctions.register(spark)
      t(spark, dir, "documents")
        .select(col("doc_id"), toks(col("text")).as("tk"))
        .selectExpr("doc_id", "minhash_sig(tk) AS sig")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  /** LSH banding: one row per (doc, band) with a portable md5 bucket key
    * over the band's 4 signature slots. Persisted per dataset dir: the
    * capped candidate join reads it three times (bucket sizes + both join
    * sides) and q42/q49 reuse the same pass. */
  private val bandCache = mutable.HashMap.empty[String, DataFrame]
  def bandsDF(spark: SparkSession, dir: String): DataFrame = synchronized {
    evictDeadSessions(bandCache, spark)
    bandCache.getOrElseUpdate(sessionCacheKey(spark, dir),
      sigsDF(spark, dir)
        .select(col("doc_id"),
          explode(sequence(lit(0), lit(Bands - 1))).as("band"), col("sig"))
        .select(col("doc_id"), col("band").cast("long").as("band"),
          md5(concat_ws("_", col("band").cast("string") +:
            (0 until RowsPerBand).map(r =>
              element_at(col("sig"), (col("band") * RowsPerBand + r + 1).cast("int"))
                .cast("string")): _*)).as("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
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

  /** LSH banding surface: (doc_id, band, bucket); near-dup candidates are
    * pairs sharing a bucket — the scale path (bucket join, never all-pairs). */
  def qMinHashBands(spark: SparkSession, dir: String): DataFrame =
    bandsDF(spark, dir).orderBy("doc_id", "band")

  /** Distinct candidate pairs (a < b) sharing any LSH band bucket — the
    * single recall stage every near-dup verifier builds on. Buckets
    * above BandBucketCap are excluded BEFORE the self-join (a per-bucket
    * count pre-pass), so a degenerate hot bucket can never go quadratic;
    * the excluded volume is a first-class metric (qBandCapMetrics). */
  def bandCandidates(spark: SparkSession, dir: String): DataFrame = {
    val bands = bandsDF(spark, dir)
    val okBuckets = bands.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .where(col("bsz") <= BandBucketCap)
      .select("band", "bucket")
    val capped = bands.join(okBuckets, Seq("band", "bucket"))
    capped.select(col("band"), col("bucket"), col("doc_id").as("a"))
      .join(capped.select(col("band"), col("bucket"), col("doc_id").as("b")),
        Seq("band", "bucket"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** The band-bucket cap surfaced as an oracled metric (q49): how many
    * (doc, band) rows sit in over-cap buckets — coverage truncation as
    * output, not a comment (the q47 pattern for the LSH path). */
  def qBandCapMetrics(spark: SparkSession, dir: String): DataFrame = {
    // r8: one conditional-agg pass over the bucket sizes (the q47
    // treatment): n_band_rows = Σ bsz, dropped/hot fold the > cap
    // predicate, n_buckets = |bsz|. Was three aggregations + two
    // crossJoins. Same values, same column order.
    val bsz = bandsDF(spark, dir).groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
    bsz.agg(
      coalesce(sum("bsz"), lit(0L)).as("n_band_rows"),
      coalesce(sum(when(col("bsz") > BandBucketCap, col("bsz"))), lit(0L))
        .as("n_dropped_rows"),
      count(when(col("bsz") > BandBucketCap, lit(1))).as("n_hot_buckets"),
      count(lit(1)).as("n_buckets"))
  }

  /** Candidate pairs from LSH buckets with verified MinHash similarity. */
  def minhashCandidates(spark: SparkSession, dir: String,
                        simThreshold: Double): DataFrame = {
    val sigs = sigsDF(spark, dir)
    val cand = bandCandidates(spark, dir)
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
      .select(col("a"), col("b"), Tables.rd(col("est_jaccard"), 4).as("est_jaccard"))

  /** SimHash (60-bit, tf-weighted) per document via the native SimHash64
    * expression — portable scheme, one pass per row. */
  def qSimHash(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.MinHashFunctions.register(spark)
    t(spark, dir, "documents")
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .selectExpr("doc_id", "simhash64(tk) AS simhash")
      .orderBy("doc_id")
  }

  /** SimHash prefix buckets: near-dups collide on low bits far more often
    * than random docs; at scale, bucket by prefix then verify inside
    * (here: the deterministic bucket-size distribution, top-50). */
  def qSimHashBuckets(spark: SparkSession, dir: String): DataFrame =
    qSimHash(spark, dir)
      .select((col("simhash").bitwiseAND(lit(0xffffL))).as("prefix16"))
      .groupBy("prefix16").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("prefix16"))
      .limit(50)

  // ---- n-gram Jaccard ------------------------------------------------

  /** Distinct (doc_id, 60-bit shingle key) pairs, persisted per dataset
    * dir: q45 uses it twice (sizes + capped join) and q47 reports its cap
    * metrics — one analysis pass feeds all of them. */
  private val shingleCache = mutable.HashMap.empty[String, DataFrame]
  def docShinglesDF(spark: SparkSession, dir: String): DataFrame = synchronized {
    evictDeadSessions(shingleCache, spark)
    shingleCache.getOrElseUpdate(sessionCacheKey(spark, dir),
      t(spark, dir, "documents")
        .select(col("doc_id"), explode(shingleKeys(col("text"))).as("sh"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** n-gram Jaccard similarity: top-20 candidate pairs by true Jaccard
    * over 3-word shingles. Pair generation via shingle inverted join
    * with a df cap (see qNgramCapMetrics for the reported coverage cap —
    * at 100 TB this is the standard anti-blowup guard). */
  def qNgramJaccardTop(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docShingles = docShinglesDF(spark, dir)
    // r8 shape change (guide §2.4): the old dfs-agg + join + sh-keyed
    // self-join + two sizes-agg broadcast joins (6 exchanges, the shingle
    // set scanned three times) becomes a JOIN-FREE window pipeline:
    //   1. n_sh per doc via a window count (counts EVERY shingle,
    //      including ones the df cap later drops — same totals as the
    //      old sizes aggregation);
    //   2. df per shingle via a window count over an explicit
    //      sh-repartition at the session's shuffle parallelism (AQE
    //      coalesced the small-byte exchange to ~3 partitions and
    //      serialized the CPU-heavy expansion above it; explicit
    //      repartitions are exempt, and the window + groupBy reuse it);
    //   3. pairs generated INSIDE each rare shingle's sorted doc list,
    //      carrying (na, nb) along — ≤ DfCap ids per group after the
    //      filter, so the fan-out is a bounded codegen explode and no
    //      join back is needed.
    // WindowExec buffers spill, so a degenerate hot shingle or hot doc
    // cannot OOM. Pair set identical: (a < b) sharing a rare shingle,
    // counted once per shared shingle; na/nb are functionally dependent
    // on a/b, so min() inside the group is THE value.
    val rare = docShingles
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy("doc_id")))
      .repartition(spark.sessionState.conf.numShufflePartitions, col("sh"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .where(col("df") <= DfCap)
    val grouped = rare.groupBy("sh") // reuses the repartition's partitioning
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh"))))
        .as("ids"))
    val pairs = grouped
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids")) - i - 1),
          y => struct(x.getField("doc_id").as("a"),
            y.getField("doc_id").as("b"),
            x.getField("n_sh").as("na"), y.getField("n_sh").as("nb"))))))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("shared"), min("p.na").as("na"),
        min("p.nb").as("nb"))
    pairs
      .select(col("a"), col("b"),
        Tables.rd(col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")), 6).as("jaccard"))
      .orderBy(desc("jaccard"), asc("a"), asc("b"))
      .limit(20)
  }

  /** Embedding-cosine near-dup: the production two-stage stack — cheap
    * MinHash-LSH band buckets generate candidates (bounded, never
    * all-pairs), then exact cosine over a hashing-vectorizer document
    * embedding (graft.functions.HashEmbed) verifies them at >= 0.97
    * (a one-word mutation of a ~100-token doc sits at ~0.977 cosine on
    * the 64-dim hashed histogram — measured; 0.995 missed those).
    * Everything on the portable hash, so the whole two-stage pipeline is
    * DuckDB-verified end-to-end. */
  val CosineThreshold = 0.97

  def qEmbedNearDup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.HashEmbedFunctions.register(spark)
    val cand = bandCandidates(spark, dir)
    val vecs = t(spark, dir, "documents")
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .selectExpr("doc_id", "hash_embed(tk) AS v")
    val cos = AnnOps.cosine(col("va"), col("vb"))
    cand
      .join(vecs.select(col("doc_id").as("a"), col("v").as("va")), "a")
      .join(vecs.select(col("doc_id").as("b"), col("v").as("vb")), "b")
      .select(col("a"), col("b"), AnnOps.r6(cos).as("cos"))
      // degenerate-pair guard: two empty docs pair up (identical
      // empty-shingle signatures) with zero vectors -> cosine yields
      // NULL (AnnOps.cosine, matching DuckDB's 0/0), which the threshold
      // drops in both engines; the isnan belt stays for any true-NaN
      // input the threshold would otherwise keep (Spark orders NaN high)
      .where(col("cos") >= CosineThreshold && !isnan(col("cos")))
      .orderBy("a", "b")
  }

  /** The df-cap surfaced as a first-class, oracled metric: how many
    * (doc, shingle) rows the q45 pair generation drops (df > DfCap) out
    * of the total — coverage truncation as output, not a code comment. */
  def qNgramCapMetrics(spark: SparkSession, dir: String): DataFrame = {
    // r8: all three metrics fold over the ONE df aggregation —
    // n_shingle_rows = Σ df, n_dropped = Σ df where df > cap (the join
    // back to ds only re-counted rows the df already counts),
    // n_distinct_shingles = |dfs|. Was: three separate aggregations +
    // a re-join + two crossJoins (5 jobs); now one agg pass. Same
    // values, same column order.
    val dfs = docShinglesDF(spark, dir).groupBy("sh").agg(count(lit(1)).as("df"))
    dfs.agg(
      coalesce(sum("df"), lit(0L)).as("n_shingle_rows"),
      coalesce(sum(when(col("df") > DfCap, col("df"))), lit(0L)).as("n_dropped"),
      count(lit(1)).as("n_distinct_shingles"))
  }

  // ---- DuckDB oracles (generated from the same constants) -------------

  private val toksSql =
    "list_filter(string_split(lower(text), ' '), w -> length(w) >= 1 AND w <> '')"
  // coalesce: DuckDB array_to_string([]) is NULL where Spark concat_ws
  // is '' — an EMPTY document must shingle to [''] in both engines
  // (found by the adversarial-corpus fuzz, tools/docs_fuzz.py)
  private val shsSql =
    s"""CASE WHEN len(toks) >= $ShingleSize
       | THEN list_transform(range(1, len(toks) - 1),
       |        j -> toks[j] || ' ' || toks[j+1] || ' ' || toks[j+2])
       | ELSE [coalesce(array_to_string(toks, ' '), '')] END""".stripMargin
  private def keysSql =
    s"list_transform(shs, s -> ${PortableHash.duckHex60("s")} % ${PortableHash.P})"
  private def sigListSql =
    (0 until NumHashes).map(i => PortableHash.duckMinHashSlot(i, "ks"))
      .mkString("[", ", ", "]")
  private val docsCte = s"docs AS (SELECT doc_id, $toksSql AS toks FROM documents)"
  private val shsCte = s"shs AS (SELECT doc_id, $shsSql AS shs FROM docs)"
  private val keysCte = s"keys AS (SELECT doc_id, $keysSql AS ks FROM shs)"
  private val sigsCte = s"sigs AS (SELECT doc_id, $sigListSql AS sig FROM keys)"
  private val bandsCte =
    s"""bands AS (SELECT doc_id, band,
       |  md5(concat_ws('_', band, ${(1 to RowsPerBand)
            .map(r => s"sig[$RowsPerBand*band + $r]").mkString(", ")})) AS bucket
       |FROM sigs, (SELECT unnest(range($Bands)) AS band) AS bb)""".stripMargin
  private val hsCte =
    s"""hs AS (SELECT doc_id,
       |  list_transform(toks, t -> ${PortableHash.duckHex60("t")}) AS hs FROM docs)""".stripMargin
  private val simhashExpr =
    s"""CASE WHEN len(hs) = 0 THEN 0 ELSE CAST(list_sum(list_transform(
       | range(${PortableHash.SimHashBits}),
       | b -> CASE WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) > len(hs)
       |      THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) END""".stripMargin
  private val dsCte =
    s"""ds AS (SELECT DISTINCT doc_id, ${PortableHash.duckHex60("s")} AS sh
       |  FROM (SELECT doc_id, unnest(shs) AS s FROM shs))""".stripMargin
  private val bszCte =
    "bsz AS (SELECT band, bucket, count(*) AS bsz FROM bands GROUP BY 1, 2)"
  /** Candidate pairs with the BandBucketCap applied — the exact SQL twin
    * of bandCandidates (over-cap buckets excluded before the self-join). */
  private val candCte =
    s"""cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |         FROM bands x JOIN bands y
       |           ON x.band = y.band AND x.bucket = y.bucket
       |          AND x.doc_id < y.doc_id
       |         JOIN bsz ON bsz.band = x.band AND bsz.bucket = x.bucket
       |         WHERE bsz.bsz <= $BandBucketCap)""".stripMargin

  /** DuckDB equivalents for every dedup query — same md5-derived hashes,
    * same arithmetic, exact match expected. */
  def oracles: Map[String, String] = Map(
    "q41_minhash_sigs" ->
      s"""WITH $docsCte, $shsCte, $keysCte
         |SELECT doc_id, ${(0 until 8).map(i =>
              s"${PortableHash.duckMinHashSlot(i, "ks")} AS h$i").mkString(", ")}
         |FROM keys ORDER BY doc_id""".stripMargin,
    "q42_minhash_bands" ->
      s"""WITH $docsCte, $shsCte, $keysCte, $sigsCte, $bandsCte
         |SELECT doc_id, band, bucket FROM bands ORDER BY doc_id, band""".stripMargin,
    "q43_simhash" ->
      s"""WITH $docsCte, $hsCte
         |SELECT doc_id, $simhashExpr AS simhash FROM hs ORDER BY doc_id""".stripMargin,
    "q44_simhash_buckets" ->
      s"""WITH $docsCte, $hsCte,
         |sh AS (SELECT doc_id, $simhashExpr AS simhash FROM hs)
         |SELECT simhash & 65535 AS prefix16, count(*) AS cnt FROM sh
         |GROUP BY 1 ORDER BY cnt DESC, prefix16 LIMIT 50""".stripMargin,
    "q45_ngram_jaccard" ->
      s"""WITH $docsCte, $shsCte, $dsCte,
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM ds GROUP BY 1),
         |dfs AS (SELECT sh, count(*) AS df FROM ds GROUP BY 1),
         |rare AS (SELECT ds.doc_id, ds.sh FROM ds JOIN dfs USING (sh)
         |         WHERE df <= $DfCap),
         |pairs AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
         |          FROM rare x JOIN rare y ON x.sh = y.sh AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2)
         |SELECT a, b, floor((shared::DOUBLE / (na + nb - shared)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
         |FROM pairs
         |JOIN (SELECT doc_id AS a, n_sh AS na FROM sizes) USING (a)
         |JOIN (SELECT doc_id AS b, n_sh AS nb FROM sizes) USING (b)
         |ORDER BY jaccard DESC, a, b LIMIT 20""".stripMargin,
    "q46_minhash_pairs" ->
      s"""WITH $docsCte, $shsCte, $keysCte, $sigsCte, $bandsCte, $bszCte,
         |$candCte,
         |est AS (SELECT c.a, c.b,
         |          len(list_filter(range($NumHashes),
         |            i -> sa.sig[i+1] = sb.sig[i+1]))::DOUBLE / $NumHashes AS ej
         |        FROM cand c JOIN sigs sa ON sa.doc_id = c.a
         |                    JOIN sigs sb ON sb.doc_id = c.b)
         |SELECT a, b, floor((ej) * 10000.0 + 0.5) / 10000.0 AS est_jaccard FROM est
         |WHERE ej >= 0.8 ORDER BY a, b""".stripMargin,
    "q47_ngram_cap_metrics" ->
      s"""WITH $docsCte, $shsCte, $dsCte,
         |dfs AS (SELECT sh, count(*) AS df FROM ds GROUP BY 1)
         |SELECT (SELECT count(*) FROM ds) AS n_shingle_rows,
         |       (SELECT count(*) FROM ds JOIN dfs USING (sh)
         |        WHERE df > $DfCap) AS n_dropped,
         |       (SELECT count(*) FROM dfs) AS n_distinct_shingles""".stripMargin,
    "q49_band_cap_metrics" ->
      s"""WITH $docsCte, $shsCte, $keysCte, $sigsCte, $bandsCte, $bszCte
         |SELECT (SELECT count(*) FROM bands) AS n_band_rows,
         |       (SELECT CAST(coalesce(sum(bsz), 0) AS BIGINT) FROM bsz
         |        WHERE bsz > $BandBucketCap) AS n_dropped_rows,
         |       (SELECT count(*) FROM bsz WHERE bsz > $BandBucketCap) AS n_hot_buckets,
         |       (SELECT count(*) FROM bsz) AS n_buckets""".stripMargin,
    "q48_embed_neardup" ->
      s"""WITH $docsCte, $shsCte, $keysCte, $sigsCte, $bandsCte, $bszCte,
         |$candCte,
         |$hsCte,
         |v AS (SELECT doc_id, list_transform(range(${graft.functions.HashEmbedHelper.Dim}),
         |        d -> len(list_filter(hs, h -> h % ${graft.functions.HashEmbedHelper.Dim} = d))::DOUBLE) AS v
         |      FROM hs),
         |sims AS (SELECT c.a, c.b, ${AnnOps.cosineSql("va.v", "vb.v")} AS cosr
         |         FROM cand c JOIN v va ON va.doc_id = c.a
         |                     JOIN v vb ON vb.doc_id = c.b)
         |SELECT a, b, ${AnnOps.r6Sql("cosr")} AS cos FROM sims
         |WHERE ${AnnOps.r6Sql("cosr")} >= $CosineThreshold AND NOT isnan(cosr)
         |ORDER BY a, b""".stripMargin)
}

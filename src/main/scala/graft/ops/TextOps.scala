package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared table access + small helpers for the operator surface. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")


  /** Whitespace tokens, lowercased, empties dropped — the `documents`
    * corpus analyzer used by the SQL-oracled text operators (the driver
    * testdata text is plain space-separated words; the full CodeAnalyzer
    * path is exercised on the source-code corpus). */
  def toks(c: Column): Column =
    filter(split(lower(c), " "), w => length(w) >= 1 && w =!= "")

  /** CodeAnalyzer-equivalent filter for simple lowercase word streams:
    * length >= 2, not pure digits, not a stopword — mirrors
    * graft.analyze.CodeAnalyzer.keep so DuckDB SQL can reproduce it. */
  def analyzedToks(c: Column): Column =
    filter(split(lower(c), " "), w =>
      length(w) >= 2 && !w.rlike("^[0-9]+$") && !w.isInCollection(
        graft.analyze.CodeAnalyzer.Stopwords.toSeq))

  /** The same stop set as a SQL IN-list literal. */
  val stopListSql: String =
    graft.analyze.CodeAnalyzer.Stopwords.toSeq.sorted
      .map(s => s"'$s'").mkString("(", ",", ")")

  /** Cheap content fingerprint of a source table directory (file names +
    * sizes + mtimes, recursive): derived-store roots (doc index, ANN
    * stores) embed it, so a regenerated dataset at the same path gets a
    * fresh root instead of a stale reopen. */
  def contentFingerprint(path: String): String = {
    def fp(f: java.io.File): String =
      if (f.isDirectory) f.listFiles().sortBy(_.getName).map(fp).mkString(",")
      else s"${f.getName}:${f.length}:${f.lastModified}"
    fp(new java.io.File(path))
  }

  /** IEEE double floor as a Column. Spark's `floor` returns LONG and
    * SATURATES at ±2^63 (observed: floor(8e21) -> Long.MaxValue) while
    * DuckDB's floor is double -> double; any double with |v| >= 2^52 is
    * already integral, so passing it through reproduces IEEE floor — and
    * DuckDB — everywhere. NaN passes through (DuckDB floor(NaN) = NaN;
    * Spark's long floor would turn it into 0). */
  def dfloor(c: Column): Column =
    when(isnan(c), c)
      .when(abs(c) >= 4503599627370496.0, c) // 2^52: spacing >= 1
      .otherwise(floor(c).cast("double"))

  /** Fold-safe cross-engine rounding to `d` decimals:
    * floor(x*10^d + 0.5)/10^d with the SAME fp ops in both engines
    * (Spark round() uses exact-binary HALF_UP, DuckDB rounds a decimal
    * rendering; they disagree on knife edges — and big magnitudes need
    * the double floor above). The SQL twin is rdSql. */
  def rd(c: Column, d: Int): Column = {
    val m = math.pow(10, d)
    dfloor(c * m + lit(0.5)) / m
  }
  def rdSql(e: String, d: Int): String = {
    val m = "1" + ("0" * d) + ".0"
    s"floor(($e) * $m + 0.5) / $m"
  }

  /** Session-bound cache key + eviction: cached DataFrames/engines are
    * bound to the SparkContext that created them, so keys carry the
    * applicationId and entries from stopped applications are dropped on
    * the next access (bounds growth across session restarts in one JVM). */
  def sessionCacheKey(spark: SparkSession, dir: String): String =
    spark.sparkContext.applicationId + "|" + dir
  def evictDeadSessions[V](cache: scala.collection.mutable.HashMap[String, V],
                           spark: SparkSession): Unit = {
    val prefix = spark.sparkContext.applicationId + "|"
    cache.filterInPlace((k, _) => k.startsWith(prefix))
  }
}

/**
 * Text-analysis operators over the `documents` table: the per-document
 * string pipeline the reference runs before indexing
 * (clean_text /root/reference/sentiment.py:412-421, token filters
 * :130-181) plus the training-data-pipeline extensions (quality scoring,
 * language-ID heuristic, token counting, fingerprinting). All pure
 * column expressions — whole-stage codegen, no UDFs.
 */
object TextOps {
  import Tables._

  /** T1 clean_text: strip URLs, HTML entities, tags, literal RT, trim
    * (/root/reference/sentiment.py:412-421). */
  def cleanText(c: Column): Column = {
    val noUrl = regexp_replace(c, "https?://\\S+", "")
    val noEnt = regexp_replace(noUrl, "&[a-zA-Z]+;", "")
    val noTag = regexp_replace(noEnt, "<[^>]*>", "")
    val noRt = regexp_replace(noTag, "\\bRT\\b", "")
    trim(regexp_replace(noRt, "\\s+", " "))
  }

  def qCleanText(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id") // sort the narrow scan; clean once after (r8)
      .select(col("doc_id"),
        explode(array(cleanText(col("text")))).as("clean"))
      .where(col("clean") =!= "")                       // F1 empty filter
      .select(col("doc_id"), col("clean"),
        length(col("clean")).cast("long").as("clean_len"))

  /** F2 min-token filter (>= 5 tokens, sentiment.py:148-151). */
  def qFilterMinTokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), size(toks(col("text"))).cast("long").as("n_tokens"))
      .where(col("n_tokens") >= 5)
      .orderBy("doc_id")

  /** F7 blacklist: drop docs containing any ignored token
    * (config nltk_tokens_ignored, sentiment.py:164-168). */
  def qFilterBlacklist(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .where(!arrays_overlap(toks(col("text")), array(lit("win"), lit("giveaway"))))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** F8 whitelist-with-threshold: keep docs with >= 2 distinct required
    * tokens (sentiment.py:170-181). */
  def qFilterWhitelist(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        size(array_intersect(toks(col("text")),
          array(lit("spark"), lit("query"), lit("join")))).cast("long").as("n_required"))
      .where(col("n_required") >= 2)
      .orderBy("doc_id")

  /** Quality scoring: length / punctuation ratio / stopword ratio /
    * mean word length. */
  def qQuality(spark: SparkSession, dir: String): DataFrame = {
    // r8: pin the token array to one evaluation with a generator
    // boundary (higher-order filter is CodegenFallback — every tk
    // reference re-tokenized), and sort the narrow scan first (see
    // qLangId). Same expressions over the pinned array.
    val stopHits = filter(col("tk"), w => w.isInCollection(
      graft.analyze.CodeAnalyzer.Stopwords.toSeq))
    // nullif guard: an EMPTY document has no token count to divide by —
    // its ratios are NULL (visible to a pipeline that wants to drop it),
    // never an ANSI divide-by-zero error
    val nTok = nullif(size(col("tk")).cast("long"), lit(0L))
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .select(col("doc_id"), col("text"),
        explode(array(toks(col("text")))).as("tk"))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars2"),
        size(col("tk")).cast("long").as("n_tokens"),
        rd(size(stopHits).cast("double") / nTok, 4).as("stop_ratio"),
        rd((length(col("text")) - size(col("tk")) + 1).cast("double") / nTok, 4)
          .as("mean_word_len"))
  }

  /** Language-ID heuristic: per-language marker-word counts, argmax with
    * frozen priority order (en > es > de > fr > zh on ties). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "la", "et", "les"),
    "zh" -> Seq("de", "shi", "zai", "he"))

  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    // r8 shape: higher-order filters are CodegenFallback, so every
    // reference to the token array (5 langs x filter + the argmax
    // when-chains) re-evaluated the split+filter subtree — tens of
    // tokenizations per row (measured ~6 s warm at sf0.1). Two
    // explode(array(...)) generator boundaries pin (1) the token array
    // and (2) the 5 marker counts to ONE evaluation each; the argmax
    // fold then reads array slots. Sort first: the narrow scan is what
    // the range sampling pass re-evaluates. Same counts, same
    // tie-break, same row order.
    val tk = toks(col("text"))
    val countsArr = array(langMarkers.map { case (_, ws) =>
      size(filter(col("tk"), w => w.isInCollection(ws)))
    }: _*)
    val cnt: Int => Column = i => col("cnts")(i)
    val langs = langMarkers.map(_._1)
    val best = langs.indices.tail.foldLeft((cnt(0), lit(langs.head))) {
      case ((bc, bl), i) =>
        (when(cnt(i) > bc, cnt(i)).otherwise(bc),
          when(cnt(i) > bc, lit(langs(i))).otherwise(bl))
    }
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy("doc_id")
      .select(col("doc_id"), col("lang"), explode(array(tk)).as("tk"))
      .select(col("doc_id"), col("lang"), explode(array(countsArr)).as("cnts"))
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        best._2.as("predicted_lang"), best._1.cast("long").as("marker_hits"))
  }

  /** Token counting: whitespace count + BPE-ish regex token count. */
  def qTokenCounts(spark: SparkSession, dir: String): DataFrame =
    // r8: one regexp_extract_all evaluation via a generator boundary
    // (it was spelled twice + re-run by the sort's sampling pass); sort
    // the narrow scan first. Same expressions over the pinned array.
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .select(col("doc_id"), col("text"),
        explode(array(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))).as("bp"))
      .select(
        col("doc_id"),
        size(toks(col("text"))).cast("long").as("ws_tokens"),
        size(col("bp")).cast("long").as("bpe_tokens"),
        // nullif: empty text -> NULL ratio, not an ANSI divide-by-zero
        rd(length(col("text")).cast("double") /
          nullif(size(col("bp")).cast("long"), lit(0L)), 4).as("chars_per_token"))

  /** T5/T10 URL extraction + host parse over synthesized URL-bearing
    * text (/root/reference/sentiment.py:89-90,343). */
  def qUrlExtract(spark: SparkSession, dir: String): DataFrame = {
    val withUrls = concat(lit("see https://example.com/"), col("source"),
      lit("/x?q=1 mid http://foo-"), col("lang"), lit(".org/page end"))
    t(spark, dir, "documents").select(
      col("doc_id"),
      size(regexp_extract_all(withUrls, lit("https?://[^\\s]+"), lit(0)))
        .cast("long").as("n_urls"),
      regexp_extract(withUrls, "https?://([^/\\s]+)", 1).as("host1")
    ).orderBy("doc_id")
  }

  /** F9 language filter (server-side `languages=['en']`,
    * /root/reference/sentiment.py:965): predicate -> partition pruning
    * on a lang-partitioned corpus. */
  def qLangFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .where(col("lang") === "en")
      .groupBy("source").agg(count(lit(1)).as("cnt"))
      .orderBy("source")

  /** F12 marker-phrase skip filter (drop docs containing a marker,
    * /root/reference/sentiment.py:538-541). */
  def qContainsFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .where(!col("text").contains("spark"))
      .groupBy("lang").agg(count(lit(1)).as("cnt"))
      .orderBy("lang")

  /** T6 date parse/format roundtrip (twitter created_at handling,
    * /root/reference/sentiment.py:101-103): format to string, parse
    * back, emit ISO (second precision). */
  def qDateParse(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events").select(
      col("event_id"),
      date_format(to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
        "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd'T'HH:mm:ss").as("iso_ts")
    ).orderBy("event_id")

  /** Document fingerprint: md5 of the normalized text (exact-dup key). */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id"),
      md5(trim(lower(col("text")))).as("fp")
    ).orderBy("doc_id")
}

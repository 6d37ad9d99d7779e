package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sentiment ensemble (SURVEY.md §2.4) as pure column expressions over the
 * Lexicon (a published-VADER subset + documented domain fixture):
 *
 *  - U1 TextBlob-style scorer: mean over lexicon-matched tokens of
 *    valence/4 (pattern polarities live in [-1,1]), negation window
 *    scaling by -0.5 — TextBlob's core "average the assessed words".
 *  - U2 VADER-style scorer: sum of matched valences with the published
 *    negation rule (a valenced token preceded within 3 tokens by a
 *    negator is scaled by -0.74), normalized x/sqrt(x^2+15) — the
 *    published compound formula (alpha = 15).
 *  - U4 ensemble vote / U5 polarity average reproduce
 *    /root/reference/sentiment.py:493-509 exactly:
 *      negative iff TB < 0  AND VADER <= -0.05
 *      positive iff TB > 0  AND VADER >= +0.05
 *      else neutral;  polarity = (TB + VADER) / 2
 *
 * Float summation order is frozen (left fold in token order) and the
 * whole computation is reproduced in DuckDB (`oracles`), so q24/q25/q27
 * are hash-verified end-to-end. Note the per-index element_at(toks, i)
 * lookups re-evaluate the tokenize subtree inside lambdas (CollapseProject
 * inlines it); fine at document scale — the graduation path, if this ever
 * becomes the hot scalar, is a native Expression like MinHashSig.
 */
object SentimentOps {
  import Tables._
  import Lexicon._

  /** Fold-safe 4-decimal rounding: floor(x*1e4 + 0.5)/1e4 computes the
    * SAME double in Spark and DuckDB (pure fp mul/add/floor/div), unlike
    * round(x, 4) — Spark rounds the exact binary value (BigDecimal
    * HALF_UP) while DuckDB rounds a decimal rendering, and the two
    * disagree on knife-edge sums like -0.056249999999999994 (observed on
    * real data). Sentiment outputs sit on such edges by construction
    * (small rational sums), so this family uses r4 everywhere. */
  private def r4(c: Column): Column = floor(c * 10000.0 + lit(0.5)) / 10000.0
  private def r4Sql(e: String): String = s"floor(($e) * 10000.0 + 0.5) / 10000.0"

  /** (tb, vader, sentiment, polarity) columns for a text column. The
    * lexicon walk (valence lookup + 3-token negation lookback, left fold
    * in token order) runs as the native `sentiment_score` expression —
    * the pure-lambda formulation re-tokenized per index (CollapseProject
    * inlining; measured 9.9 s / 500 docs, ~500x slower). The compound
    * normalization and the vote stay visible column expressions. */
  def scored(text: Column): Seq[Column] = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.SentimentFunctions.register)
    val s = call_function("sentiment_score", toks(text))
    val tb = s.getField("tb")
    val x = s.getField("x")
    val vader = x / sqrt(x * x + lit(15.0))
    val sentiment = when(tb < 0 && vader <= -0.05, "negative")
      .when(tb > 0 && vader >= 0.05, "positive")
      .otherwise("neutral")
    val polarity = (tb + vader) / 2.0
    Seq(r4(tb).as("tb"), r4(vader).as("vader"),
      sentiment.as("sentiment"), r4(polarity).as("polarity"))
  }

  /** U3/U4: the ensemble vote with the OPTIONAL web scorer present
    * (reference `-w` flag, default off): when a web label exists, the
    * vote additionally requires its agreement —
    *   negative iff TB < 0 AND VADER <= -0.05 AND web == 'negative'
    *   positive iff TB > 0 AND VADER >= 0.05 AND web == 'positive'
    * (/root/reference/sentiment.py:493-506; the web call itself is an
    * external service and stays out of scope — callers supply the label
    * column, null = scorer off, reproducing the reference default). */
  def voteWithWeb(tb: Column, vader: Column, web: Column): Column =
    when(tb < 0 && vader <= -0.05 &&
      (web.isNull || web === "negative"), "negative")
      .when(tb > 0 && vader >= 0.05 &&
        (web.isNull || web === "positive"), "positive")
      .otherwise("neutral")

  /** T2 clean_text_sentiment: strip `[#|@]\S+` mentions/hashtags before
    * scoring (/root/reference/sentiment.py:424-428 — the reference's char
    * class contains a literal pipe, so tokens starting with '|' are
    * stripped too; reproduced verbatim for pipeline fidelity). */
  def cleanTextSentiment(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "[#|@]\\S+", ""), "\\s+", " "))

  /** Per-document ensemble scores (U1/U2/U4/U5). */
  def qSentimentDocs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id") +: scored(col("text")): _*)
      .orderBy("doc_id")

  /** T2 as a registered operator: documents decorated with synthetic
    * mentions/hashtags (testdata has none — same trick as q34's URLs),
    * stripped, and re-scored: the strip changes token POSITIONS, which
    * moves negation windows — observable, oracle-verified behavior. */
  def qCleanSentiment(spark: SparkSession, dir: String): DataFrame = {
    val decorated = concat(lit("not @u1 #t2 @u3 "), col("text"),
      lit(" #tail_"), col("lang"))
    t(spark, dir, "documents")
      .select(col("doc_id") +:
        cleanTextSentiment(decorated).as("clean") +:
        scored(cleanTextSentiment(decorated)): _*)
      .select(col("doc_id"), length(col("clean")).cast("long").as("clean_len"),
        col("tb"), col("vader"), col("sentiment"))
      .orderBy("doc_id")
  }

  /** Per-key state bound for qLinkMerge: only the most recent MergeWindow
    * events per key are collected (a window-rank filter BEFORE the
    * groupBy, so executor state is bounded even for a degenerate hot
    * key). The running (acc+x)/2 fold halves older contributions
    * exponentially — an event 256 steps back weighs 2^-256, far below
    * double precision — so the window is semantically lossless at any
    * realistic precision; the cap is still REPORTED per key
    * (n_events_used / n_events_total), never silent. */
  val MergeWindow = 256

  /** U6 link-sentiment merge: the reference folds per-link scores with a
    * running pairwise average acc=(acc+x)/2 — order-dependent, so the
    * fold runs over the (ts, event_id)-sorted value list exactly
    * (/root/reference/sentiment.py:201-222). Pure higher-order exprs,
    * bounded per-key state (MergeWindow). */
  def qLinkMerge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy("user_id")
    val recency = byKey.orderBy(desc("ts"), desc("event_id"))
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(recency))
      .withColumn("n_events_total", count(lit(1)).over(byKey))
      .where(col("rn") <= MergeWindow)
      .groupBy("user_id")
      .agg(
        expr(
          "sort_array(collect_list(named_struct('ts', ts, 'event_id', event_id, 'value', value)))")
          .as("ordered"),
        count(lit(1)).as("n_events_used"),
        max("n_events_total").as("n_events_total"))
      .select(col("user_id"),
        round(expr(
          "aggregate(transform(ordered, o -> o.value), " +
          "named_struct('started', false, 'acc', cast(0.0 as double)), " +
          "(s, x) -> named_struct('started', true, " +
          "'acc', IF(s.started, (s.acc + x) / 2.0, x)), " +
          "s -> s.acc)"), 4).as("merged"),
        col("n_events_used"), col("n_events_total"))
      .orderBy("user_id")
  }

  /** Dashboard rollup: terms agg over sentiment + avg/median polarity
    * (export.json:49,63 shape). */
  def qSentimentAgg(spark: SparkSession, dir: String): DataFrame =
    qSentimentDocs(spark, dir)
      .groupBy("sentiment")
      .agg(count(lit(1)).as("cnt"),
        r4(avg("polarity")).as("avg_polarity"),
        r4(min("polarity")).as("min_polarity"),
        r4(max("polarity")).as("max_polarity"))
      .orderBy("sentiment")

  // ---- DuckDB oracles (same lexicon/window/fold order) -----------------

  private val toksSql =
    "list_filter(string_split(lower(text), ' '), w -> length(w) >= 1 AND w <> '')"

  /** The scoring pipeline as SQL over a CTE exposing (doc_id, toks). */
  private def scoredSql(srcCte: String): String =
    s"""$srcCte,
       |lex AS (SELECT ${Lexicon.duckMapSql} AS m),
       |ts AS (SELECT doc_id, toks, list_transform(range(len(toks)), i0 ->
       |  struct_pack(v := m[toks[i0 + 1]][1],
       |    neg := i0 > 0 AND len(list_filter(
       |      toks[greatest(1, i0 - ${NegWindow - 1}):i0],
       |      w -> w IN ${Lexicon.duckNegatorsSql})) > 0)) AS ts
       |  FROM docs, lex),
       |sc AS (SELECT doc_id,
       |  CASE WHEN len(list_filter(ts, s -> s.v IS NOT NULL)) = 0 THEN 0.0
       |       ELSE list_reduce(list_transform(
       |              list_filter(ts, s -> s.v IS NOT NULL),
       |              s -> s.v / 4.0 * (CASE WHEN s.neg THEN $TbNegScalar ELSE 1.0 END)),
       |            (a, b) -> a + b)
       |            / len(list_filter(ts, s -> s.v IS NOT NULL)) END AS tb,
       |  CASE WHEN len(ts) = 0 THEN 0.0
       |       ELSE list_reduce(list_transform(ts,
       |              s -> coalesce(s.v, 0.0) *
       |                   (CASE WHEN s.neg THEN $VaderNegScalar ELSE 1.0 END)),
       |            (a, b) -> a + b) END AS x
       |  FROM ts),
       |scored AS (SELECT doc_id, tb, x / sqrt(x * x + 15.0) AS vader FROM sc)""".stripMargin

  private def voteSql: String =
    s"""SELECT doc_id, ${r4Sql("tb")} AS tb, ${r4Sql("vader")} AS vader,
       | CASE WHEN tb < 0 AND vader <= -0.05 THEN 'negative'
       |      WHEN tb > 0 AND vader >= 0.05 THEN 'positive'
       |      ELSE 'neutral' END AS sentiment,
       | ${r4Sql("(tb + vader) / 2.0")} AS polarity
       |FROM scored""".stripMargin

  def sentimentDocsOracle: String =
    s"""WITH ${scoredSql(s"docs AS (SELECT doc_id, $toksSql AS toks FROM documents)")}
       |$voteSql ORDER BY doc_id""".stripMargin

  def sentimentAggOracle: String =
    s"""SELECT sentiment, count(*) AS cnt,
       | ${r4Sql("avg(polarity)")} AS avg_polarity,
       | ${r4Sql("min(polarity)")} AS min_polarity,
       | ${r4Sql("max(polarity)")} AS max_polarity
       |FROM ($sentimentDocsOracle) GROUP BY sentiment ORDER BY sentiment""".stripMargin

  def cleanSentimentOracle: String = {
    val decorated = "'not @u1 #t2 @u3 ' || text || ' #tail_' || lang"
    val cleaned =
      s"trim(regexp_replace(regexp_replace($decorated, '[#|@]\\S+', '', 'g'), '\\s+', ' ', 'g'))"
    val srcCte =
      s"""raw AS (SELECT doc_id, $cleaned AS text FROM documents),
         |docs AS (SELECT doc_id, length(text) AS clean_len, $toksSql AS toks FROM raw)""".stripMargin
    s"""WITH ${scoredSql(srcCte)}
       |SELECT scored.doc_id, docs.clean_len, ${r4Sql("tb")} AS tb,
       |       ${r4Sql("vader")} AS vader,
       | CASE WHEN tb < 0 AND vader <= -0.05 THEN 'negative'
       |      WHEN tb > 0 AND vader >= 0.05 THEN 'positive'
       |      ELSE 'neutral' END AS sentiment
       |FROM scored JOIN docs ON scored.doc_id = docs.doc_id
       |ORDER BY scored.doc_id""".stripMargin
  }
}

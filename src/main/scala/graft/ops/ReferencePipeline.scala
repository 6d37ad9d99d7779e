package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's tweet ingest lifecycle (SURVEY.md §3.1,
 * /root/reference/sentiment.py:71-240) as ONE composed Catalyst plan —
 * the exact stage order matters (cheap filters run before sentiment
 * scoring, mirroring the reference's early-exit ordering):
 *
 *   raw tweet rows
 *     -> T1 clean_text (urls, entities, tags, RT)
 *     -> F1 drop null/empty text
 *     -> tokenize (whitespace path of the analyzer)
 *     -> F2 min 5 tokens
 *     -> F3 drop zero friends/followers/statuses
 *     -> F4 dedup by tweet_id (keep first by ts)
 *     -> F7 blacklist tokens (win/giveaway)
 *     -> F8 whitelist >= nltk_min_tokens distinct required tokens
 *     -> T2 clean_text_sentiment ([#|@]\S+ strip — only the SCORED text,
 *        the stored message keeps mentions; sentiment.py:184,424-428)
 *     -> U1/U2/U4/U5 sentiment ensemble
 *     -> projection to the stored doc schema
 *
 * Input schema: (tweet_id long, ts timestamp, author string,
 * friends long, followers long, statuses long, message string).
 */
object ReferencePipeline {
  import Tables._

  val BlacklistTokens = Seq("win", "giveaway") // config.py.sample:11
  val RequiredTokens = Seq("fast", "slow", "merge", "query") // -a/-k tokens
  val MinRequired = 1 // nltk_min_tokens default (config.py.sample:9-10)

  def tweets(raw: DataFrame): DataFrame = {
    val cleaned = raw
      .withColumn("clean", TextOps.cleanText(col("message")))
      .where(col("clean").isNotNull && col("clean") =!= "")          // F1
      .withColumn("tokens", toks(col("clean")))
      .where(size(col("tokens")) >= 5)                               // F2
      .where(col("friends") > 0 && col("followers") > 0 &&
             col("statuses") > 0)                                    // F3
    val deduped = cleaned
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("tweet_id").orderBy(asc("ts"))))
      .where(col("rn") === 1).drop("rn")                             // F4
    val filtered = deduped
      .where(!arrays_overlap(col("tokens"),
        array(BlacklistTokens.map(lit): _*)))                        // F7
      .where(size(array_intersect(col("tokens"),
        array(RequiredTokens.map(lit): _*))) >= MinRequired)         // F8
    filtered
      .select(col("tweet_id") +: col("author") +: col("ts") +:
        size(col("tokens")).cast("long").as("n_tokens") +:
        SentimentOps.scored(
          SentimentOps.cleanTextSentiment(col("clean"))): _*)        // T2, U1-U5
      .orderBy("tweet_id")
  }

  /** Fixture golden rows (FIXTURES.md §2): every reference edge case. */
  def goldenTweets(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // survives: clean, enough tokens, required token 'fast', positive
      (1L, "2024-01-01 10:00:00", "alice", 10L, 20L, 30L,
        "the fast fast merge pipeline is quite good today"),
      // T1 strips URL/entity/tag/RT; still enough tokens; 'slow' negative
      (2L, "2024-01-01 10:00:01", "bob", 5L, 5L, 5L,
        "RT slow slow degraded badly https://x.co/abc &amp; <b>wow</b> again today"),
      // F2: fewer than 5 tokens after cleaning
      (3L, "2024-01-01 10:00:02", "carol", 9L, 9L, 9L, "fast tiny msg https://x.co/z"),
      // F3: zero followers
      (4L, "2024-01-01 10:00:03", "dave", 3L, 0L, 7L,
        "fast merge query tokens flowing nicely here"),
      // F4: duplicate tweet_id (later ts loses)
      (1L, "2024-01-01 11:00:00", "alice2", 10L, 20L, 30L,
        "the fast fast merge pipeline is quite good today"),
      // F7: blacklisted token
      (5L, "2024-01-01 10:00:05", "eve", 2L, 2L, 2L,
        "win a fast merge prize now everyone"),
      // F8: no required token at all
      (6L, "2024-01-01 10:00:06", "frank", 4L, 4L, 4L,
        "table scan join group window batch stream"),
      // F1: empty after cleaning
      (7L, "2024-01-01 10:00:07", "gina", 1L, 1L, 1L, "RT https://only.url &amp;"),
      // T2 + negation: the mentions hold 'fast' outside the 3-token
      // negation window until clean_text_sentiment strips them — with T2
      // the vote flips to negative (without the strip it is POSITIVE:
      // un-negated 'fast' carries the vote; spec-asserted)
      (8L, "2024-01-01 10:00:08", "hank", 6L, 6L, 6L,
        "not @x1 @x2 @x3 fast merge query running today"))
      .toDF("tweet_id", "ts_s", "author", "friends", "followers", "statuses", "message")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
  }
}

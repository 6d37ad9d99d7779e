package graft

import graft.ops.ReferencePipeline
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §2 golden rows through the full tweet lifecycle
  * (SURVEY.md §3.1): each reference filter knocks out exactly its case;
  * the survivors carry the ensemble's labels. */
class ReferencePipelineSpec extends AnyFunSuite with SparkSessionFixture {

  test("tweet pipeline: filters F1-F8 + T2 + ensemble on the golden rows") {
    val out = ReferencePipeline.tweets(ReferencePipeline.goldenTweets(spark))
      .collect()
    // survivors: tweet 1 (first copy), tweet 2, tweet 8
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 8L))

    val t1 = out(0)
    assert(t1.getAs[String]("author") === "alice") // dedup kept the earlier ts
    assert(t1.getAs[String]("sentiment") === "positive") // fast x2 + good
    assert(t1.getAs[Double]("polarity") > 0)

    val t2 = out(1)
    assert(t2.getAs[String]("sentiment") === "negative") // slow x2 + badly > wow
    assert(t2.getAs[Double]("polarity") < 0)
    // T1 stripped url/entities/tags/RT before tokenization
    assert(t2.getAs[Long]("n_tokens") >= 5)

    // T2: stripping @mentions pulls 'fast' into the negator's 3-token
    // window -> negation flips the label to negative
    val t8 = out(2)
    assert(t8.getAs[String]("sentiment") === "negative")
    assert(t8.getAs[Double]("vader") <= -0.05)
    assert(t8.getAs[Double]("tb") < 0)
  }

  test("T2 is what flips the negation golden (without the strip: positive)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val raw = Seq("not @x1 @x2 @x3 fast merge query running today").toDF("text")
    val withT2 = raw.select(graft.ops.SentimentOps.scored(
      graft.ops.SentimentOps.cleanTextSentiment(col("text"))): _*).head()
    val withoutT2 = raw.select(graft.ops.SentimentOps.scored(col("text")): _*).head()
    assert(withT2.getAs[String]("sentiment") === "negative")
    // un-stripped, the mentions hold 'fast' outside the negation window
    assert(withoutT2.getAs[String]("sentiment") === "positive")
  }

  test("pipeline is a single Catalyst plan (no collect boundaries)") {
    val df = ReferencePipeline.tweets(ReferencePipeline.goldenTweets(spark))
    val p = df.queryExecution.optimizedPlan.toString
    // the filters fused into the plan; no custom RDD nodes
    assert(!p.contains("ExternalRDD") || p.contains("LocalRelation"), p)
  }
}

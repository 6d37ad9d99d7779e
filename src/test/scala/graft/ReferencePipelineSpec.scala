package graft

import graft.ops.ReferencePipeline
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §2 golden rows through the full tweet lifecycle
  * (SURVEY.md §3.1): each reference filter knocks out exactly its case;
  * the survivors carry the ensemble's labels. */
class ReferencePipelineSpec extends AnyFunSuite with SparkSessionFixture {

  test("tweet pipeline: filters F1-F8 + ensemble on the golden rows") {
    val out = ReferencePipeline.tweets(ReferencePipeline.goldenTweets(spark))
      .collect()
    // survivors: tweet 1 (first copy) and tweet 2
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))

    val t1 = out(0)
    assert(t1.getAs[String]("author") === "alice") // dedup kept the earlier ts
    assert(t1.getAs[String]("sentiment") === "positive") // 'fast' x2 lexicon hits
    assert(t1.getAs[Double]("polarity") > 0)

    val t2 = out(1)
    assert(t2.getAs[String]("sentiment") === "negative") // 'slow' x2
    assert(t2.getAs[Double]("polarity") < 0)
    // T1 stripped url/entities/tags/RT before tokenization
    assert(t2.getAs[Long]("n_tokens") >= 5)
  }

  test("pipeline is a single Catalyst plan (no collect boundaries)") {
    val df = ReferencePipeline.tweets(ReferencePipeline.goldenTweets(spark))
    val p = df.queryExecution.optimizedPlan.toString
    // the filters fused into the plan; no custom RDD nodes
    assert(!p.contains("ExternalRDD") || p.contains("LocalRelation"), p)
  }
}

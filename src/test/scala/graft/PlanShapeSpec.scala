package graft

import graft.ops._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the plans must stay the ones we'd want
  * at 100 TB — filters pushed to the parquet scan, column pruning, top-k
  * as TakeOrderedAndProject, dimension joins broadcast, aggregates
  * partial+final, whole-stage codegen on the hot paths. Guards against
  * silent plan regressions (the "first plan that passed" trap). */
class PlanShapeSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("top-k by count plans as TakeOrderedAndProject (no global sort)") {
    val p = plan(DashboardOps.qTermsTop5(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("GlobalLimit"), "should not full-sort then limit")
  }

  test("dimension joins broadcast (no shuffle join for nation/region)") {
    val p = plan(DashboardOps.qJoinDims(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("aggregations are partial+final hash aggregates") {
    val p = plan(DashboardOps.qPricingSummary(spark, sf))
    assert(p.contains("HashAggregate"), p)
    assert(p.split("HashAggregate").length >= 3, "expect partial + final")
  }

  test("lang filter is pushed to the parquet scan") {
    val p = plan(TextOps.qLangFilter(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]")
      || p.contains("EqualTo(lang,en)"), p)
  }

  test("column pruning: token top-25 reads only the text column") {
    val p = plan(DashboardOps.qTermsTop25Tokens(spark, sf))
    assert(p.contains("ReadSchema: struct<text:string>"), p)
  }

  test("BM25 DataFrame plan: single scan family, broadcast stats, codegen") {
    val df = SearchOps.qBm25TopK(spark, sf)
    df.collect() // finalize AQE so the executed plan shows codegen stages
    val p = plan(df)
    assert(p.contains("*("), s"expected WholeStageCodegen spans (*(n)):\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("engine postings read prunes on term (pushed IN-filter)") {
    val eng = SearchOps.docEngine(spark, sf)
    val filtered = eng.postings.where(
      org.apache.spark.sql.functions.col("term").isin("spark", "query"))
    val p = plan(filtered)
    assert(p.contains("PushedFilters") && p.contains("In(term"), p)
    // the SCORING projection never reads the position column: the
    // parquet ReadSchema must exclude posBlocks (the Lucene .doc/.pos
    // split expressed as column pruning)
    assert(!p.contains("posBlocks"),
      s"scoring scan must prune the position column:\n$p")
    // ... while the phrase path's full read does include it
    val full = plan(eng.postingsFull.where(
      org.apache.spark.sql.functions.col("term").isin("spark")))
    assert(full.contains("posBlocks"), full)
  }

  test("prefix expansion dict scan pushes StringStartsWith") {
    val eng = SearchOps.docEngine(spark, sf)
    val p = plan(eng.dict.where(
      org.apache.spark.sql.functions.col("term").startsWith("s")))
    assert(p.contains("StringStartsWith(term,s)"),
      s"prefix expansion must push the StartsWith filter:\n$p")
  }

  test("highlight/explain point lookups push term-IN AND the docId's shard") {
    val eng = SearchOps.docEngine(spark, sf)
    val filtered = eng.postings.where(
      org.apache.spark.sql.functions.col("term").isin("spark", "query") &&
        org.apache.spark.sql.functions.col("shard") === 3)
    val p = plan(filtered)
    assert(p.contains("In(term") && p.contains("EqualTo(shard,3)"),
      s"point lookup must push both filters:\n$p")
  }

  test("docmeta point-lookup pushes the docId IN-filter") {
    val eng = SearchOps.docEngine(spark, sf)
    val p = plan(eng.docmeta.where(
      org.apache.spark.sql.functions.col("docId").isin(1L, 2L, 3L)))
    assert(p.contains("In(docId"), p)
  }

  test("semi/anti joins plan as semi/anti (no row explosion)") {
    assert(plan(DashboardOps.qJoinSemi(spark, sf)).contains("LeftSemi"))
    assert(plan(DashboardOps.qJoinAnti(spark, sf)).contains("LeftAnti"))
  }

  test("WHERE match(): semi-join against the lazy MatchIds leaf, pruned scan, AQE broadcast") {
    val df = SearchOps.qMatchWhere(spark, sf)
    df.collect() // finalize AQE so the runtime join choice is visible
    val p = plan(df)
    assert(p.contains("MatchIds"), p)
    assert(p.contains("LeftSemi"), p)
    // the hit set is small here: AQE must have converted to broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    // the rewritten scan reads only the projected columns — the text
    // column is DEAD once the predicate is a docId semi-join
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), p)
    // building the plan (explain) must not run the index walk: its
    // compile-time job count equals a PLAIN query over the same table
    // (the one job either way is the parquet footer/listing read).
    // Count via the MAX job id, not the tracked-job-list length: the
    // status tracker retains a bounded window and evicting old entries
    // mid-measurement made the length DELTA negative deep into a full
    // suite run (observed -99); job ids are monotone and immune.
    def maxJob() = spark.sparkContext.statusTracker
      .getJobIdsForGroup(null).maxOption.getOrElse(-1)
    val j0 = maxJob()
    Tables.t(spark, sf, "documents").where("doc_id > 0")
      .queryExecution.executedPlan
    val plainJobs = maxJob() - j0
    val j1 = maxJob()
    SearchOps.qMatchWhere(spark, sf).queryExecution.executedPlan
    val matchJobs = maxJob() - j1
    assert(matchJobs <= plainJobs,
      s"match plan compile ran $matchJobs job(s) vs $plainJobs for a plain " +
        "query; the hit set must stay lazy")
  }
}

package graft

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, QueryEngine}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The MatchTopK custom operator: planned by MatchStrategy, results
  * identical to the engine API, composable with further DataFrame ops. */
class MatchTopKSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val root: String = {
    val work = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "matchtopk").toString
    val r = s"$work/index"
    IndexBuilder.build(spark, CorpusGen.dataset(spark, 400, 42L, 4), r, 4)
    r
  }

  test("MatchTopK plans through MatchStrategy to MatchTopKExec") {
    val df = GraftSql.search(spark, root, "computeHashValue", 10)
    assert(df.queryExecution.executedPlan.exists(_.isInstanceOf[graft.plans.MatchTopKExec]),
      df.queryExecution.executedPlan.toString)
  }

  test("results identical to the engine API, with metadata attached") {
    val df = GraftSql.search(spark, root, "buildPostingList mergeSortedRuns", 10)
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val eng = new QueryEngine(spark, root)
    val exp = eng.topK("buildPostingList mergeSortedRuns", 10)
      .map(h => (h.docId, h.score))
    assert(got.toSeq === exp)
    assert(df.columns.toSeq ===
      Seq("docId", "score", "repo", "path", "commit", "lang", "sha256"))
    assert(df.collect().forall(_.getString(6).length == 64)) // sha256 attached
  }

  test("boolean mode + composability with ordinary operators") {
    val df = GraftSql.search(spark, root, "def return, val match", 10, boolMode = true)
      .where(org.apache.spark.sql.functions.col("lang") === "scala")
      .select("path", "score")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val eng = new QueryEngine(spark, root)
    assert(rows.length <= eng.booleanTopK("def return, val match", 10).size)
  }

  test("GraftExtensions applies cleanly; registered functions work via SQL") {
    // builder-time injection can't be exercised on the shared test context
    // (getOrCreate would return it); verify the extension wiring applies
    // and the same registrations behave on the live session.
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions())
    graft.functions.GraftFunctions.register(spark)
    graft.functions.MinHashFunctions.register(spark)
    val toks = spark.sql("SELECT code_tokenize('mergeSortedRuns x') AS t")
      .collect().head.getSeq[String](0)
    assert(toks === Seq("merge", "sorted", "runs", "mergesortedruns"))
    val sig = spark.sql("SELECT size(minhash_sig(array('a','b','c','d'))) AS n")
      .collect().head.getInt(0)
    assert(sig === 64)
  }
}

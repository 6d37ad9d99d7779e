package graft

import graft.analyze.CodeAnalyzer
import graft.functions.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** The code_tokenize Catalyst expression: SQL parity with the frozen
  * CodeAnalyzer semantics, and it must stay inside whole-stage codegen. */
class FunctionSpec extends AnyFunSuite with SparkSessionFixture {

  test("code_tokenize in SQL == CodeAnalyzer.analyze (incl. camelCase paths)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val inputs = Seq(
      "def computeHashValue(inputBuffer, 42):",
      "HTTPServerConfig block_max_score the a of",
      "plain lowercase words here",
      "foo2Bar __init__ x",
      "")
    inputs.toDF("s").createOrReplaceTempView("fn_in")
    val got = spark.sql("SELECT code_tokenize(s) FROM fn_in")
      .collect().map(_.getSeq[String](0).toSeq)
    got.zip(inputs).foreach { case (g, in) =>
      assert(g === CodeAnalyzer.analyze(in), s"input '$in'")
    }
  }

  test("code_tokenize runs inside whole-stage codegen (file scan, not folded)") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("fn_docs")
    val df = spark.sql(
      "SELECT sum(size(code_tokenize(text))) AS n FROM fn_docs")
    val n = df.collect().head.getLong(0)
    assert(n > 1000L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"expected codegen span:\n$p")
    // the expression itself must appear inside the codegen'd project
    assert(p.contains("code_tokenize"), p)
  }

  test("null-safety through the expression") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(Some("abc def"), None).toDF("s").createOrReplaceTempView("fn_in3")
    val rows = spark.sql("SELECT code_tokenize(s) FROM fn_in3").collect()
    assert(rows(0).getSeq[String](0) === Seq("abc", "def"))
    assert(rows(1).isNullAt(0))
  }
}

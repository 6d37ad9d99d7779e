package graft

import graft.plans.{MatchStrategy, MatchTopK}
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}

/** User-facing search API over a committed index, as a Catalyst plan:
  * `GraftSql.search(spark, root, "buildPostingList", 10)` produces a
  * DataFrame whose logical plan is the MatchTopK operator, planned by
  * MatchStrategy (injected here for sessions built without
  * spark.sql.extensions=graft.GraftExtensions). */
object GraftSql {
  def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(MatchStrategy))
      spark.experimental.extraStrategies =
        MatchStrategy +: spark.experimental.extraStrategies
  }

  /** Runtime wiring for the `match()` WHERE-predicate in sessions built
    * WITHOUT spark.sql.extensions=graft.GraftExtensions: registers the
    * scalar function and adds the index semi-join rewrite to
    * experimental.extraOptimizations. Idempotent. */
  def ensureMatchSupport(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    ensureStrategy(spark) // the rewrite emits a MatchIds leaf to plan
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("match")))
      reg.registerFunction(
        FunctionIdentifier("match"),
        new ExpressionInfo(classOf[graft.plans.MatchFilter].getName, null,
          "match", "match(content, query) - boolean keyword filter", ""),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 2, "match(content, query) takes 2 arguments")
          graft.plans.MatchFilter(exprs(0), exprs(1))
        })
    if (!spark.experimental.extraOptimizations
          .contains(graft.plans.MatchFilterRewrite))
      spark.experimental.extraOptimizations =
        graft.plans.MatchFilterRewrite +:
          spark.experimental.extraOptimizations
  }

  def search(spark: SparkSession, indexRoot: String, query: String,
             k: Int = 10, boolMode: Boolean = false): DataFrame = {
    ensureStrategy(spark)
    GraftBridge.ofRows(spark, MatchTopK(indexRoot, query, k, boolMode))
  }
}

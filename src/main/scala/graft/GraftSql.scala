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

  def search(spark: SparkSession, indexRoot: String, query: String,
             k: Int = 10, boolMode: Boolean = false): DataFrame = {
    ensureStrategy(spark)
    GraftBridge.ofRows(spark, MatchTopK(indexRoot, query, k, boolMode))
  }
}

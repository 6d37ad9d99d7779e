package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness for the cross-engine sentiment parity claim: dumps
  * qSentimentDocs over an arbitrary documents dir (first arg) to parquet
  * (second arg) so a DuckDB run of the same oracle SQL can be compared
  * value-exactly on ADVERSARIAL texts (caps, punctuation, boosters,
  * negation phrases, but-clauses) that the driver testdata never hits.
  * Paired with tools/sent_fuzz.py. */
object SentFuzz {
  def main(args: Array[String]): Unit = {
    val Array(dir, out) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.SentimentOps.qSentimentDocs(spark, dir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    // the oracle SQL for the same computation, for the python side
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/oracle.sql"),
      graft.SparkEntry.oracleSql("q24_sentiment_docs"))
    spark.stop()
  }
}

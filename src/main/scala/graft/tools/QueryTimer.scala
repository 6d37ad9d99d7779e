package graft.tools
import org.apache.spark.sql.SparkSession
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        // same materialization as the driver's Verify (count() would let
        // Catalyst prune the expensive columns away)
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"/root/repo/target/graftwork/qt/$name")
        val n = spark.read.parquet(s"/root/repo/target/graftwork/qt/$name").count()
        println(f"[qt] $name%-26s ${(System.nanoTime()-t0)/1e9}%8.2f s  ($n rows)")
      } catch { case e: Throwable =>
        println(f"[qt] $name%-26s FAILED ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession

/** Per-op timing probe: `runMain graft.tools.QueryTimer [sfDir] [prefix...]`
  * runs each (matching) SparkEntry query with the Bench-style
  * warm-then-timed protocol and prints both times — cold includes
  * one-time store builds/opens, warm is the steady-state number the
  * bench records. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefixes = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        prefixes.isEmpty || prefixes.exists(name.startsWith) }
      .foreach { case (name, fn) =>
        try {
          // same materialization as the driver's Verify (count() would let
          // Catalyst prune the expensive columns away)
          def run(): Long = {
            val t0 = System.nanoTime()
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"/root/repo/target/graftwork/qt/$name")
            System.nanoTime() - t0
          }
          val cold = run()
          val warm = run()
          val n = spark.read
            .parquet(s"/root/repo/target/graftwork/qt/$name").count()
          println(f"[qt] $name%-26s cold ${cold / 1e9}%8.2f s  warm ${warm / 1e9}%8.2f s  ($n rows)")
        } catch { case e: Throwable =>
          println(f"[qt] $name%-26s FAILED ${e.getMessage.take(80)}")
        }
      }
    spark.stop()
  }
}

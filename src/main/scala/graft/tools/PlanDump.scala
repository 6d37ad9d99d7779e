package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for SparkEntry queries to
  * plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence
  * files). Usage:
  *   runMain graft.tools.PlanDump <tag> <suffix> [sfDir] [namePrefix...]
  * e.g. runMain graft.tools.PlanDump r08 before /root/testdata/sf0.1 q45 q47 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("r08")
    val suffix = args.lift(1).getOrElse("before")
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val prefixes = args.drop(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get(s"/root/repo/plans/$tag")
    Files.createDirectories(outDir)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        prefixes.isEmpty || prefixes.exists(name.startsWith) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          // execute once so AQE final plans + engine collects are realistic
          df.write.format("noop").mode("overwrite").save()
          val formatted = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), formatted)
          println(s"[plandump] wrote $name"+ s"_$suffix.txt")
        } catch { case e: Throwable =>
          println(s"[plandump] $name FAILED: ${e.getMessage.take(120)}")
        }
      }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Wall-clock decomposition of one SparkEntry op: runs the op with the
  * Bench materialization (coalesce(1).write.parquet) warm + timed, with a
  * listener printing per-job and per-stage durations/task counts for the
  * timed run. Not part of the driver contract.
  * Usage: runMain graft.tools.ProfileOp <qname> [sfDir] */
object ProfileOp {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    val out = s"${graft.ops.SearchOps.workDir}/profile-op/$name"
    def run(): Unit = fn(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(out)
    run() // warm
    val jobs = mutable.LinkedHashMap.empty[Int, (Long, Long, Int, String)]
    val stages = mutable.LinkedHashMap.empty[Int, (Long, Long, Int, String)]
    val listener = new SparkListener {
      private val jobStart = mutable.HashMap.empty[Int, (Long, String)]
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart(j.jobId) = (j.time,
          Option(j.properties.getProperty("spark.job.description")).getOrElse(""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobStart.get(j.jobId).foreach { case (t0, d) =>
          jobs(j.jobId) = (t0, j.time - t0, 0, d) }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        stages(si.stageId) = (
          si.submissionTime.getOrElse(0L),
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks, si.name.split("\n").head.take(90))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    run()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let listener events drain
    println(f"[profileop] $name total ${sec}%.3f s, ${jobs.size} jobs, ${stages.size} stages")
    jobs.foreach { case (id, (t0j, dur, _, d)) =>
      println(f"[profileop]   job $id%3d  ${dur}%6d ms  $d") }
    stages.toSeq.sortBy(_._2._1).foreach { case (id, (_, dur, nt, nm)) =>
      println(f"[profileop]   stage $id%3d  ${dur}%6d ms  $nt%3d tasks  $nm") }
    spark.stop()
  }
}

package graft.tools

import graft.corpus.CorpusGen
import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession

/** Isolated index-build timing at given core counts (the bench's
  * runLevel build phase, reproduced for optimization iteration —
  * NOT part of the driver contract). Usage:
  *   runMain graft.tools.BuildBench [nDocs] [cpus...]
  * Each level gets a fresh session (master local[cpus],
  * shuffle.partitions=32, numShards=32 — same plan at every level,
  * exactly like graft.Bench). */
object BuildBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(100000L)
    val levels = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(32, 2)
    // JIT warm pass at the first level
    runOne(levels.head, 2000L, warm = true)
    levels.foreach { n =>
      val s = runOne(n, nDocs, warm = false)
      println(f"[buildbench] n$n%-3d ${s}%8.2f s  ${nDocs / s}%10.1f docs/s")
    }
  }

  private def runOne(cpus: Int, nDocs: Long, warm: Boolean): Double = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-buildbench-$cpus")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      val root = s"${graft.ops.SearchOps.workDir}/buildbench-idx-$cpus"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val corpus = CorpusGen.dataset(spark, nDocs, 42L, 64)
      val stages = scala.collection.mutable.LinkedHashMap.empty[Int, (Long, Int, String)]
      val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, (Long, String)]
      val listener = new org.apache.spark.scheduler.SparkListener {
        private val jobStart = scala.collection.mutable.HashMap.empty[Int, (Long, String)]
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.synchronized { jobStart(j.jobId) = (j.time,
            Option(j.properties.getProperty("spark.job.description")).getOrElse("")) }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs.synchronized { jobStart.get(j.jobId).foreach { case (t0, d) =>
            jobs(j.jobId) = (j.time - t0, d) } }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = s.stageInfo
          stages.synchronized {
            stages(si.stageId) = (
              si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
              si.numTasks, si.name.split("\n").head.take(70))
          }
        }
      }
      if (!warm) spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, corpus, root, numShards = 32)
      val sec = (System.nanoTime() - t0) / 1e9
      if (!warm && sys.env.contains("BUILDBENCH_STAGES")) {
        Thread.sleep(300)
        jobs.foreach { case (id, (dur, d)) =>
          println(f"[buildbench]   n$cpus job $id%3d ${dur}%6d ms  $d")
        }
        stages.foreach { case (id, (dur, nt, nm)) =>
          println(f"[buildbench]   n$cpus stage $id%3d ${dur}%6d ms $nt%3d tasks  $nm")
        }
      }
      sec
    } finally spark.stop()
  }
}

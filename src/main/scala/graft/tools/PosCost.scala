package graft.tools
import graft.corpus.CorpusGen
import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession

/** One-shot decomposition: index-build throughput with and without
  * positional postings at the bench scale — attributes the r5 build
  * docs/s delta to the positions feature (ES indexes positions on text
  * fields by default; this engine now does too). */
object PosCost {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(100000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = graft.ops.SearchOps.workDir
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // warm both paths once (JIT), then measure alternating
    Seq(true, false, true, false).zipWithIndex.foreach { case (pos, i) =>
      val root = s"$work/poscost-$pos"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val corpus = CorpusGen.dataset(spark, nDocs, 42L, cpus * 2)
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, corpus, root, numShards = cpus, positions = pos)
      val sec = (System.nanoTime() - t0) / 1e9
      val warm = if (i < 2) " (warm)" else ""
      println(f"[poscost] positions=$pos%-5s ${nDocs / sec}%.0f docs/s ($sec%.1f s)$warm")
      val size = org.apache.commons.io.FileUtils.sizeOfDirectory(new java.io.File(root))
      println(f"[poscost] positions=$pos%-5s index bytes ${size / 1024 / 1024}%d MB")
    }
    spark.stop()
  }
}

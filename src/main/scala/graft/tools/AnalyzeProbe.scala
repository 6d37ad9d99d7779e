package graft.tools

import graft.analyze.CodeAnalyzer
import graft.corpus.CorpusGen
import graft.index._
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch probe: cost split of the build's analyze stage — raw analysis
  * vs columnar cache build vs cache read. Usage:
  *   runMain graft.tools.AnalyzeProbe [cpus] [nDocs] */
object AnalyzeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(32)
    val nDocs = args.lift(1).map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[aprobe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def analyzed() = {
      val corpus = CorpusGen.dataset(spark, nDocs, 42L, 64)
      corpus
        .repartition(32, col("repo"), col("path"), col("commit"))
        .sortWithinPartitions("repo", "path", "commit")
        .as[graft.corpus.CorpusDoc]
        .mapPartitions { it =>
          val shard = TaskContext.getPartitionId()
          var idx = 0L
          it.map { d =>
            val id = IndexBuilder.docIdFor(0, shard, idx)
            idx += 1
            val (tpm, dl) = CodeAnalyzer.termPositions(d.content)
            AnalyzedDoc(id, d.repo, d.path, d.commit, d.lang,
              IndexBuilder.sha256Hex(d.content), dl,
              tpm.toArray.sortBy(_._1).map { case (t, ps) =>
                TermFreq(t, ps.length, Codec.encodePositions(Array(ps))) },
              -1L)
          }
        }
    }
    // JIT warm
    val w = analyzed(); w.write.format("noop").mode("overwrite").save()
    timed("A gen+shuffle+analyze (noop, x1)") {
      analyzed().write.format("noop").mode("overwrite").save()
    }
    timed("A2 same again (shuffle reused)") {
      analyzed().write.format("noop").mode("overwrite").save()
    }
    val cached = analyzed().persist(StorageLevel.MEMORY_AND_DISK)
    timed("B analyze + cache build (count)") { cached.count() }
    timed("C cache read meta cols (noop)") {
      cached.select("docId", "repo", "path", "commit", "lang", "sha256",
        "docLen", "tableId").write.format("noop").mode("overwrite").save()
    }
    timed("D cache read terms explode (noop)") {
      cached.select(col("docId"), col("docLen"), explode(col("terms")).as("t"))
        .select(col("docId"), col("t.term"), col("t.tf"), col("t.pos"), col("docLen"))
        .write.format("noop").mode("overwrite").save()
    }
    // postings MAP-STAGE split (r8 continuation): explode vs + in-stage
    // sort vs + run-build/PFOR-encode — exactly the IndexBuilder postings
    // shapes, to attribute the stage's cost between its three parts
    val shardCol = IndexBuilder.shardColOf(col("docId"))
    def postingsBase = cached
      .select(col("docId"), col("docLen"), explode(col("terms")).as("t"))
      .select(shardCol.as("shard"), col("t.term").as("term"), col("docId"),
        col("t.tf").as("tf"), col("docLen").as("dl"), col("t.pos").as("pos"))
      .as[TokenPosting]
    timed("E postings explode (noop)") {
      postingsBase.write.format("noop").mode("overwrite").save()
    }
    timed("F explode+sort (noop)") {
      postingsBase.sortWithinPartitions("term", "shard", "docId")
        .write.format("noop").mode("overwrite").save()
    }
    timed("G explode+sort+buildRuns (noop)") {
      postingsBase.sortWithinPartitions("term", "shard", "docId")
        .mapPartitions(IndexBuilder.buildRuns)
        .write.format("noop").mode("overwrite").save()
    }
    timed("H explode+accumRuns (noop)") {
      postingsBase.mapPartitions(IndexBuilder.accumRuns)
        .write.format("noop").mode("overwrite").save()
    }
    timed("G2 sort+buildRuns again") {
      postingsBase.sortWithinPartitions("term", "shard", "docId")
        .mapPartitions(IndexBuilder.buildRuns)
        .write.format("noop").mode("overwrite").save()
    }
    timed("H2 accumRuns again") {
      postingsBase.mapPartitions(IndexBuilder.accumRuns)
        .write.format("noop").mode("overwrite").save()
    }
    cached.unpersist()
    spark.stop()
  }
}

package graft.tools

import graft.corpus.CorpusGen
import graft.index._
import graft.analyze.CodeAnalyzer
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch profiler: per-phase timings of the index build at a given
  * core count. Not part of the driver contract. */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(32)
    val nDocs = args.lift(1).map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val root = s"/root/repo/target/graftwork/profile-$cpus"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))

    val corpus = CorpusGen.dataset(spark, nDocs, 42L, 64)
    timed("gen only (count)") { corpus.count() }

    val routed = corpus
      .repartition(32, col("repo"), col("path"), col("commit"))
      .sortWithinPartitions("repo", "path", "commit")
      .as[graft.corpus.CorpusDoc]
    val analyzed = routed.mapPartitions { it =>
      val shard = TaskContext.getPartitionId()
      var idx = 0L
      it.map { d =>
        val id = IndexBuilder.docIdFor(0, shard, idx)
        idx += 1
        val (tfm, dl) = CodeAnalyzer.termFreqs(d.content)
        AnalyzedDoc(id, d.repo, d.path, d.commit, d.lang,
          IndexBuilder.sha256Hex(d.content), dl,
          tfm.toArray.sortBy(_._1).map { case (t, f) =>
            TermFreq(t, f, Array.emptyByteArray) }, -1L)
      }
    }.persist(StorageLevel.MEMORY_AND_DISK)
    timed("analyze+persist (count)") { analyzed.count() }
    timed("docmeta write") {
      analyzed.map(a => DocMeta(a.docId, a.repo, a.path, a.commit, a.lang,
        a.sha256, a.docLen, IndexBuilder.shardOf(a.docId), -1L))
        .write.mode("overwrite").parquet(s"$root/docmeta")
    }
    timed("postings shuffle+encode+write") {
      analyzed.flatMap(a => a.terms.iterator.map(tf =>
        TokenPosting(IndexBuilder.shardOf(a.docId), tf.term, a.docId, tf.tf,
          a.docLen, tf.pos)))
        .repartition(col("shard"), col("term"))
        .sortWithinPartitions("shard", "term", "docId")
        .mapPartitions(IndexBuilder.buildRuns _)
        .write.mode("overwrite").parquet(s"$root/postings")
    }
    timed("metrics aggs") {
      spark.read.parquet(s"$root/postings").agg(count(lit(1)), sum("df"), sum("bytes")).head()
      spark.read.parquet(s"$root/docmeta").agg(count(lit(1)), sum("docLen")).head()
    }
    timed("dict rebuild+write") {
      spark.read.parquet(s"$root/postings")
        .groupBy("term").agg(sum("df").as("df"), count(lit(1)).as("subLists"))
        .write.mode("overwrite").parquet(s"$root/dict")
    }
    spark.stop()
  }
}

package graft.index

import graft.table._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.mutable

/**
 * Hierarchical segment merge (the ES/Lucene tiered-merge analogue):
 * compacts all committed segments into one. Because docIds are globally
 * unique and ascending across (batch, shard) by construction (see
 * IndexBuilder docId layout), merging posting lists is a pure
 * concatenation of sub-lists ordered by firstDoc — NO docID remapping, no
 * re-scoring, deterministic output. Sub-lists are re-blocked into fresh
 * 128-entry blocks so skip density is restored after many small ingests.
 *
 * Plan: union segment postings -> shuffle on (shard, term) -> stream
 * re-encode runs -> new immutable segment + snapshot commit. Old segment
 * files are left in place (snapshot isolation; readers of the old
 * manifest stay correct) until `IcebergLite.gc(keepManifests)` physically
 * deletes everything unreachable from the kept snapshot horizon.
 */
object SegmentMerge {

  def merge(spark: SparkSession, root: String): Manifest = {
    import spark.implicits._
    val tbl = new IcebergLite(root)
    val prev = tbl.currentManifest()
      .getOrElse(throw new IllegalStateException(s"nothing to merge at $root"))
    if (prev.segments.size <= 1) return prev

    val postingPaths = prev.segments.map(s => s"$root/${s.name}/postings")
    val docmetaPaths = prev.segments.map(s => s"$root/${s.name}/docmeta")
    val segName = s"seg-merged-${prev.version}"
    val segRoot = s"$root/$segName"

    spark.read.parquet(postingPaths: _*).as[PostingRow]
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("shard"), col("term"))
      .map(r => (r.shard, r.term, r.skips.head.firstDoc, r))
      .toDF("shard", "term", "firstDoc", "row")
      .sortWithinPartitions("term", "shard", "firstDoc")
      .as[(Int, String, Long, PostingRow)]
      .mapPartitions { it =>
        val in = it.map(_._4).buffered
        new Iterator[PostingRow] {
          def hasNext: Boolean = in.hasNext
          def next(): PostingRow = {
            val head = in.head
            val subs = mutable.ArrayBuffer.empty[PostingRow]
            while (in.hasNext && in.head.shard == head.shard &&
                   in.head.term == head.term) subs += in.next()
            // decode in firstDoc order, concatenate, re-block
            val docs = mutable.ArrayBuilder.make[Long]
            val tfs = mutable.ArrayBuilder.make[Int]
            val dls = mutable.ArrayBuilder.make[Int]
            var df = 0L
            subs.foreach { r =>
              val enc = EncodedPostings(r.blocks.toArray, r.skips.toArray
                .map(s => Skip(s.firstDoc, s.lastDoc, s.maxTf, s.minDl)), r.df)
              val (d, t, l) = Codec.decodeAll(enc)
              docs ++= d; tfs ++= t; dls ++= l; df += r.df
            }
            val enc = Codec.encode(docs.result(), tfs.result(), dls.result())
            PostingRow(head.shard, head.term, df,
              enc.blocks.iterator.map(_.length.toLong).sum, enc.blocks.toSeq,
              enc.skips.toSeq.map(s => SkipRow(s.firstDoc, s.lastDoc, s.maxTf, s.minDl)))
          }
        }
      }
      .write.mode("overwrite")
      .option("parquet.block.size", (4 * 1024 * 1024).toString)
      .parquet(s"$segRoot/postings")

    spark.read.parquet(docmetaPaths: _*)
      .write.mode("overwrite").parquet(s"$segRoot/docmeta")

    val pst = spark.read.parquet(s"$segRoot/postings")
    val mrow = pst.agg(count(lit(1)), sum("df"), sum("bytes")).head()
    val metrics = SegmentMetrics(prev.numDocs, mrow.getLong(0),
      mrow.getLong(1), mrow.getLong(2))

    // Materialize the global term dictionary (term -> df) at compaction:
    // at 10^12 docs, deriving dfs from postings at every engine open is a
    // real job; the compacted snapshot ships it precomputed. Named per
    // version (immutable) so readers pinned to older manifests keep their
    // own view — snapshot isolation holds.
    val dictName = s"dict-v${prev.version + 1}"
    pst.groupBy("term").agg(sum("df").as("df"))
      .write.mode("overwrite").parquet(s"$root/$dictName")

    // Lineage: the merged segment must carry the UNION of its inputs'
    // ingest-batch ids (IndexBuilder's streaming idempotence guard checks
    // them — a micro-batch re-delivered after compaction stays a no-op)
    // and their bulk-build shard coverage (drives bulk resume).
    val batches = prev.segments.flatMap(IcebergLite.batchesOf).distinct.sorted
    val b0Shards = prev.segments.flatMap(IcebergLite.batch0Shards).distinct.sorted
    val seg = SegmentInfo(0, segName,
      prev.segments.flatMap(_.shards).distinct.sorted, metrics,
      Map("mergedFrom" -> prev.segments.map(_.name).mkString(","),
        "batches" -> batches.mkString(","),
        "batch0Shards" -> b0Shards.mkString(",")))
    val manifest = Manifest(prev.version + 1, prev.numShards, Seq(seg),
      prev.numDocs, prev.totalTokens, dict = Some(dictName))

    tbl.commit(manifest)
    manifest
  }
}

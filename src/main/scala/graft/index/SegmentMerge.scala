package graft.index

import graft.table._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.mutable

/**
 * Hierarchical segment merge (the ES/Lucene tiered-merge analogue):
 * `merge` fully compacts to one segment; `tiered` runs the smallest-first
 * compaction ladder down to a target segment count. Because docIds are globally
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

  /** Full compaction: all committed segments -> one. */
  def merge(spark: SparkSession, root: String): Manifest = {
    val tbl = new IcebergLite(root)
    val prev = tbl.currentManifest()
      .getOrElse(throw new IllegalStateException(s"nothing to merge at $root"))
    if (prev.segments.size <= 1) return prev
    mergeSegments(spark, root, prev, prev.segments)
  }

  /** Tiered compaction (the Lucene-ish ladder the north star names):
    * while more than `maxSegments` remain, merge the cheapest run of
    * BATCH-ADJACENT segments (at most `fanIn` per pass) into one.
    * Adjacency in ingest-batch order is a CORRECTNESS constraint, not a
    * heuristic: docIds embed the batch id in their top bits, so merging
    * a non-contiguous set (e.g. batches {1,3} around a kept batch 2)
    * would create a segment whose per-(shard,term) docId range
    * interleaves the kept segment's — the query path concatenates
    * sub-lists by firstDoc and requires them non-interleaved, and a
    * later merge of such segments would feed non-ascending docIds into
    * the codec. Among the adjacent windows, the smallest total byte size
    * wins (small ingest segments compact cheaply and often, big ones
    * rarely). Each pass is an atomic snapshot commit, so a crash
    * mid-ladder leaves a consistent (just less-compacted) index. */
  def tiered(spark: SparkSession, root: String, maxSegments: Int,
             fanIn: Int = 10): Manifest = {
    require(maxSegments >= 1 && fanIn >= 2)
    val tbl = new IcebergLite(root)
    var m = tbl.currentManifest()
      .getOrElse(throw new IllegalStateException(s"nothing to merge at $root"))
    while (m.segments.size > maxSegments) {
      val surplus = m.segments.size - maxSegments + 1
      val window = math.min(surplus, fanIn)
      val ordered = m.segments.sortBy(s => IcebergLite.batchesOf(s).min)
      val victims = ordered.sliding(window)
        .minBy(_.iterator.map(_.metrics.bytes).sum)
      m = mergeSegments(spark, root, m, victims)
    }
    m
  }

  /** Compact-and-rebase: fully compact the index AND remap the effective
    * ingest-batch ids baked into the docId top bits down to dense
    * 0..k-1, advancing the manifest's batchBase so the stream's
    * ever-growing raw ids keep mapping onto small effective ids — the
    * remedy for a stream that outlives the ${IndexBuilder.BatchBits}-bit
    * docId batch budget (IndexBuilder.docIdFor fails loudly at 2048
    * effective batches; this job resets that headroom).
    *
    * The remap e_i -> i is strictly increasing on the batch bits and
    * identity on the low bits, so docIds stay ascending everywhere —
    * posting sub-lists re-encode without re-sorting, and query-time
    * score/tie semantics within the index are preserved (scores do not
    * depend on docId values; ordering is preserved by monotonicity).
    * Re-delivery of an old RAW batch id stays a no-op afterwards via the
    * origBatches lineage. Single atomic snapshot commit. */
  def rebase(spark: SparkSession, root: String): Manifest = {
    val tbl = new IcebergLite(root)
    val prev = tbl.currentManifest()
      .getOrElse(throw new IllegalStateException(s"nothing to rebase at $root"))
    val effIds = prev.segments.flatMap(IcebergLite.batchesOf).distinct.sorted
    if (effIds.isEmpty) return prev
    val remap = effIds.zipWithIndex.toMap
    // continuity: a future raw id B mapped to B - newBase lands directly
    // after the rebased ids (the next raw id the stream can deliver is
    // > base + max(eff), which maps to >= k)
    val newBase = prev.batchBase + (effIds.max.toLong + 1L - effIds.size)
    mergeSegments(spark, root, prev, prev.segments,
      rebase = Some((remap, newBase)))
  }

  /** Merge a subset of `prev`'s segments into one new segment; untouched
    * segments carry over. The global dict is materialized only when the
    * result is fully compacted (one segment) — a partial tier would need
    * an extra pass over the KEPT segments' postings to stay global, so
    * partial snapshots derive dfs at query time instead. With `rebase`
    * set (full compaction only), docIds' batch bits are remapped through
    * the given (effId -> denseId) map and the manifest's batchBase moves
    * to the given value. */
  private def mergeSegments(spark: SparkSession, root: String, prev: Manifest,
                            toMerge: Seq[SegmentInfo],
                            rebase: Option[(Map[Int, Int], Long)] = None): Manifest = {
    import spark.implicits._
    val tbl = new IcebergLite(root)
    if (toMerge.size <= 1 && rebase.isEmpty) return prev
    require(rebase.isEmpty || toMerge.size == prev.segments.size,
      "rebase requires a full compaction")
    val kept = prev.segments.filterNot(s => toMerge.exists(_.name == s.name))

    val postingPaths = toMerge.map(s => s"$root/${s.name}/postings")
    val docmetaPaths = toMerge.map(s => s"$root/${s.name}/docmeta")
    val segName = s"seg-merged-${prev.version}"
    val segRoot = s"$root/$segName"

    // monotone docId remap (identity unless rebasing): strictly
    // increasing in the batch bits, identity on shard|idx — preserves
    // ascending docId order inside every posting sub-list.
    val batchRemap: Map[Int, Int] = rebase.map(_._1).getOrElse(Map.empty)
    val lowMask = (1L << (IndexBuilder.IdxBits + IndexBuilder.ShardBits)) - 1L
    def remapDocId(id: Long): Long =
      if (batchRemap.isEmpty) id
      else {
        val b = (id >>> (IndexBuilder.IdxBits + IndexBuilder.ShardBits)).toInt
        (batchRemap(b).toLong << (IndexBuilder.IdxBits + IndexBuilder.ShardBits)) |
          (id & lowMask)
      }

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
            // decode in firstDoc order, concatenate, remap, re-block
            val docs = mutable.ArrayBuilder.make[Long]
            val tfs = mutable.ArrayBuilder.make[Int]
            val dls = mutable.ArrayBuilder.make[Int]
            var df = 0L
            subs.foreach { r =>
              val enc = EncodedPostings(r.blocks.toArray, r.skips.toArray
                .map(s => Skip(s.firstDoc, s.lastDoc, s.maxTf, s.minDl)), r.df)
              val (d, t, l) = Codec.decodeAll(enc)
              docs ++= d.map(remapDocId); tfs ++= t; dls ++= l; df += r.df
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

    val dm = spark.read.parquet(docmetaPaths: _*)
    val dmOut =
      if (batchRemap.isEmpty) dm
      else {
        val remapCol = typedLit(batchRemap.map { case (k, v) => (k, v.toLong) })
        val shiftBits = IndexBuilder.IdxBits + IndexBuilder.ShardBits
        dm.withColumn("docId",
          shiftLeft(element_at(remapCol,
            shiftRightUnsigned(col("docId"), shiftBits).cast("int")), shiftBits)
            .bitwiseOR(col("docId").bitwiseAND(lit(lowMask))))
      }
    dmOut.write.mode("overwrite").parquet(s"$segRoot/docmeta")

    val pst = spark.read.parquet(s"$segRoot/postings")
    val mrow = pst.agg(count(lit(1)), sum("df"), sum("bytes")).head()
    val metrics = SegmentMetrics(toMerge.map(_.metrics.docs).sum, mrow.getLong(0),
      mrow.getLong(1), mrow.getLong(2))

    // Materialize the global term dictionary (term -> df) at full
    // compaction: at 10^12 docs, deriving dfs from postings at every
    // engine open is a real job; the compacted snapshot ships it
    // precomputed. Named per version (immutable) so readers pinned to
    // older manifests keep their own view — snapshot isolation holds.
    val dict: Option[String] =
      if (kept.isEmpty) {
        val dictName = s"dict-v${prev.version + 1}"
        pst.groupBy("term").agg(sum("df").as("df"))
          .write.mode("overwrite").parquet(s"$root/$dictName")
        Some(dictName)
      } else None

    // Lineage: the merged segment must carry the UNION of its inputs'
    // ingest-batch ids — effective ids remapped when rebasing ("batches",
    // checked by the idempotence guard against effective ids) AND the raw
    // stream ids ("origBatches", unchanged by rebase, checked first) —
    // plus the bulk-build shard coverage (drives bulk resume).
    val batches = toMerge.flatMap(IcebergLite.batchesOf).distinct
      .map(b => batchRemap.getOrElse(b, b)).sorted
    val origBatches = toMerge.flatMap(IcebergLite.origBatchesOf).distinct.sorted
    val b0Shards = toMerge.flatMap(IcebergLite.batch0Shards).distinct.sorted
    val seg = SegmentInfo(prev.version, segName,
      toMerge.flatMap(_.shards).distinct.sorted, metrics,
      Map("mergedFrom" -> toMerge.map(_.name).mkString(","),
        "batches" -> batches.mkString(","),
        "origBatches" -> origBatches.mkString(","),
        "batch0Shards" -> b0Shards.mkString(",")))
    val manifest = Manifest(prev.version + 1, prev.numShards, kept :+ seg,
      prev.numDocs, prev.totalTokens, dict = dict,
      batchBase = rebase.map(_._2).getOrElse(prev.batchBase))

    tbl.commit(manifest)
    manifest
  }
}

package graft.index

import graft.analyze.CodeAnalyzer
import graft.corpus.CorpusDoc
import graft.table._
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable

/** Per-document index metadata (the ES-internal "stored fields + norms"
  * analogue; carries the sha256 row invariant vs the source table).
  * `tableId` is the SOURCE table's join key when the build declared one
  * (tableIdOf) — the `WHERE match()` semi-join reads it instead of
  * re-deriving an id from path conventions; -1 when the build has no
  * numeric key (composite-key tables join on repo/path/commit). */
final case class DocMeta(docId: Long, repo: String, path: String, commit: String,
                         lang: String, sha256: String, docLen: Int, shard: Int,
                         tableId: Long)

/** Analyzer output for one document (intermediate, persisted across the
  * docmeta write and the postings shuffle so content is analyzed once).
  * `pos` = the term's positions ALREADY delta-varint encoded
  * (Codec.encodePositions of one posting — ~1 byte/position instead of
  * a 4-byte int each across the shuffle; at 1M docs the raw-int
  * position payload tripled the build time). Per-posting streams are
  * self-delimiting given tf, so block streams are pure concatenation.
  * Empty when the build disabled positions; tf = position count. */
final case class TermFreq(term: String, tf: Int, pos: Array[Byte])
final case class AnalyzedDoc(docId: Long, repo: String, path: String,
                             commit: String, lang: String, sha256: String,
                             docLen: Int, terms: Array[TermFreq],
                             tableId: Long)

/** One (shard, term, doc) token posting — the SPIMI shuffle record.
  * `pos` = the doc's pre-encoded position stream for this term. */
final case class TokenPosting(shard: Int, term: String, docId: Long, tf: Int,
                              dl: Int, pos: Array[Byte])

/** Skip entry as stored in parquet (mirror of Codec.Skip). */
final case class SkipRow(firstDoc: Long, lastDoc: Long, maxTf: Int, minDl: Int)

/** One stored posting (sub-)list: the postings of `term` within one
  * document shard, as compressed blocks + skip entries. Document-sharded
  * posting lists bound every shuffle group by the shard size — the hot-term
  * skew defuser: "def"'s postings are numShards bounded groups, never one
  * giant reducer (the built-in salting required by the north rule).
  *
  * This is the SCORING projection: reading it prunes the positions
  * column out of the parquet scan entirely (the Lucene .doc/.pos file
  * split, expressed as parquet column pruning) — BM25/boolean scoring
  * never pays the position bytes. */
final case class PostingRow(shard: Int, term: String, df: Long, bytes: Long,
                            blocks: Seq[Array[Byte]], skips: Seq[SkipRow])

/** The FULL stored row: the scoring columns plus `posBlocks`, one
  * position stream per 128-posting block (Codec.encodePositions; empty
  * when the build disabled positions). Phrase queries read this shape. */
final case class PostingRowPos(shard: Int, term: String, df: Long, bytes: Long,
                               blocks: Seq[Array[Byte]], skips: Seq[SkipRow],
                               posBlocks: Seq[Array[Byte]])

object PostingRow {
  /** The scoring-projection column list (everything but posBlocks). */
  val LiteCols: Seq[String] =
    Seq("shard", "term", "df", "bytes", "blocks", "skips")
}

final case class BuildReport(manifest: Manifest, segment: Option[SegmentInfo],
                             builtShards: Seq[Int], docs: Long)

/**
 * SPIMI-style distributed index build over an Iceberg-style corpus table
 * (repo, path, commit, lang, content) — the engine-side replacement for
 * what Elasticsearch did for the reference when it called
 * `es.index(doc)` (/root/reference/sentiment.py:227-240): analyze ->
 * postings -> compressed segment + committed metadata.
 *
 * Scale design (targets a 1000-executor / 10^12-file cluster; local[32]
 * only verifies correctness):
 *  - Documents are hash-sharded by (repo,path,commit):
 *    shard = pmod(murmur3(repo,path,commit), numShards), which is exactly
 *    Spark's HashPartitioning id — so `repartition(numShards, keys)` makes
 *    partitionId == shard with no extra pass.
 *  - docId = (batch << 52) | (shard << 32) | localIdx: dense within a
 *    shard (delta-friendly), globally unique across shards and ingest
 *    batches, deterministic under resume (a shard is always built whole,
 *    in exactly one pass). Merges therefore never remap docIDs.
 *  - One analysis pass (persisted), one shuffle to (shard, term) for the
 *    postings build. The shuffle key contains the shard, so hot terms are
 *    pre-salted; group building streams via sortWithinPartitions +
 *    mapPartitions run detection — no unbounded in-memory groups.
 *  - Resume: per-shard checkpoint records; a re-run filters completed
 *    shards out BEFORE the scan (predicate on the same hash expression,
 *    pushable) and appends a new immutable segment.
 */
object IndexBuilder {

  /** Index FORMAT version: bump when analyzer/codec/layout semantics
    * change, so durable indexes built by an older engine are rebuilt
    * instead of reopened (cache roots embed it). v3: docmeta carries the
    * explicit source-table id column (tableId). v4: postings carry an
    * optional per-block position stream (posBlocks). */
  val FormatVersion = "4"

  /** Loud format gate at OPEN time: every writer since v4 stamps
    * `FormatVersion` into the manifest, so a durable pre-v4 root — whose
    * parquet lacks posBlocks/tableId columns — fails here with a clear
    * rebuild message instead of an opaque `cannot resolve posBlocks`
    * AnalysisException deep inside the first query. (Cache roots embed
    * the version in their PATH and never hit this; explicit
    * MatchRegistry.IndexRoot / direct QueryEngine / SegmentMerge use is
    * what this protects.) An EMPTY manifest (no segments yet) passes —
    * there is nothing on disk whose layout could be stale. */
  def requireFormat(m: graft.table.Manifest, root: String): Unit =
    if (m.segments.nonEmpty && !m.format.contains(FormatVersion)) {
      // UNSTAMPED manifests get one more chance (ADVICE r6): manifests
      // written by the first v4-layout engine revision predate the format
      // stamp, and forcing those fully-compatible durable roots through a
      // rebuild punishes exactly the users the stamp exists to protect.
      // Sniff every segment's parquet footers for the v4 columns
      // (postings.posBlocks + docmeta.tableId); a compatible root is
      // accepted as v4 — the next writer commit stamps it (build/merge
      // always write format=FormatVersion). A manifest stamped with a
      // DIFFERENT version, or a root whose physical schema lacks the v4
      // columns, still fails with the rebuild message.
      val compatible = m.format.isEmpty && m.segments.forall(s =>
        parquetHasColumn(s"$root/${s.name}/postings", "posBlocks") &&
          parquetHasColumn(s"$root/${s.name}/docmeta", "tableId"))
      if (!compatible)
        throw new IllegalStateException(
          s"index at $root has on-disk format ${m.format.getOrElse("<pre-4, unstamped>")} " +
            s"but this engine requires format $FormatVersion — rebuild the index " +
            "(drop the root and re-run IndexBuilder, or point at a fresh root)")
    }

  /** Does the first parquet file under `dir` carry a top-level column
    * named `col`? Direct footer read (one file, metadata only) — the
    * format sniff above runs where no SparkSession is in scope. */
  private def parquetHasColumn(dir: String, col: String): Boolean = try {
    val f = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .find(f => f.getName.endsWith(".parquet") && f.length() > 0)
      .getOrElse(return false)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.getAbsolutePath),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema.containsField(col)
    finally r.close()
  } catch { case scala.util.control.NonFatal(_) => false }

  /** Spark SQL expression equal to the shard id a row lands on. */
  def shardExpr(numShards: Int) =
    pmod(hash(col("repo"), col("path"), col("commit")), lit(numShards))

  /** docId bit budget, sized for the 10^12-file target: 11-bit ingest
    * batch | 20-bit shard (up to ~1M document shards => ~1M docs/shard at
    * 10^12 files, so a full stopword posting sub-list stays ~8 MB) |
    * 32-bit local index (4.3B docs per shard per batch headroom). */
  val IdxBits = 32
  val ShardBits = 20
  val BatchBits = 11 // leaves the sign bit clear: docIds stay non-negative

  /** All three fields are range-checked so overflow fails LOUDLY instead
    * of silently corrupting the docId space: batch 2048 would set the sign
    * bit (negative docIds break the frozen score-desc/docId-asc ties) and
    * batch 4096 would wrap onto batch 0. Streams that outlive 2047
    * micro-batches must compact-and-rebase into a fresh index root (a
    * batch-id remap job) — documented re-batch policy, not silent wrap. */
  def docIdFor(batch: Int, shard: Int, idx: Long): Long = {
    require(idx >= 0 && idx < (1L << IdxBits), s"local idx $idx out of range")
    require(shard >= 0 && shard < (1 << ShardBits), s"shard $shard out of range")
    require(batch >= 0 && batch < (1 << BatchBits),
      s"ingest batch $batch exceeds the ${1 << BatchBits}-batch docId budget; " +
        "compact and rebase the index to reset batch ids")
    (batch.toLong << (IdxBits + ShardBits)) | (shard.toLong << IdxBits) | idx
  }

  def shardOf(docId: Long): Int =
    ((docId >> IdxBits) & ((1L << ShardBits) - 1)).toInt

  /** shardOf as a codegen'd Column (same bit arithmetic) — the single
    * home for the docId bit layout on the DataFrame side. */
  def shardColOf(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    shiftright(docId, IdxBits).bitwiseAND(lit((1L << ShardBits) - 1)).cast("int")

  private val HexChars = "0123456789abcdef".toCharArray

  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val d = md.digest(s.getBytes("UTF-8"))
    // table-driven hex (the per-byte "%02x".format of the original spent
    // ~3M Formatter calls per 100k-doc build — same output, r8)
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Encode one complete (shard, term) posting run into its stored row.
    * The single compression path shared by [[buildRuns]] and
    * [[accumRuns]] — both therefore produce identical bytes for the
    * same run content. */
  private def encodeRun(shard: Int, term: String, docs: Array[Long],
                        tfs: Array[Int], dls: Array[Int],
                        poss: collection.IndexedSeq[Array[Byte]],
                        hasPos: Boolean): PostingRowPos = {
    val enc = Codec.encode(docs, tfs, dls)
    // one position stream per 128-posting block, parallel to blocks:
    // per-posting streams are self-delimiting (tf counts them), so a
    // block stream is the plain concatenation of its postings'
    // pre-encoded streams — no re-encode on the build path
    val posBlocks: Seq[Array[Byte]] =
      if (!hasPos) Nil
      else poss.grouped(Codec.BlockSize).map { g =>
        val out = new Array[Byte](g.iterator.map(_.length).sum)
        var off = 0
        g.foreach { b =>
          System.arraycopy(b, 0, out, off, b.length); off += b.length
        }
        out
      }.toSeq
    PostingRowPos(shard, term, docs.length,
      enc.blocks.iterator.map(_.length.toLong).sum, enc.blocks.toSeq,
      enc.skips.toSeq.map(s => SkipRow(s.firstDoc, s.lastDoc, s.maxTf, s.minDl)),
      posBlocks)
  }

  /** Streaming run-builder: consumes token postings sorted with contiguous
    * (term, shard) runs (either sort major works — the run boundary checks
    * both fields; docId ascending within a run) and emits one PostingRow
    * per run, holding only a single run's postings (bounded by shard size)
    * in memory. */
  def buildRuns(it: Iterator[TokenPosting]): Iterator[PostingRowPos] = {
    val in = it.buffered
    new Iterator[PostingRowPos] {
      def hasNext: Boolean = in.hasNext
      def next(): PostingRowPos = {
        val head = in.head
        val docs = mutable.ArrayBuilder.make[Long]
        val tfs = mutable.ArrayBuilder.make[Int]
        val dls = mutable.ArrayBuilder.make[Int]
        val poss = mutable.ArrayBuffer.empty[Array[Byte]]
        var hasPos = true
        while (in.hasNext && in.head.shard == head.shard &&
               in.head.term == head.term) {
          val p = in.next()
          docs += p.docId; tfs += p.tf; dls += p.dl; poss += p.pos
          if (p.pos.isEmpty) hasPos = false
        }
        encodeRun(head.shard, head.term, docs.result(), tfs.result(),
          dls.result(), poss, hasPos)
      }
    }
  }

  /** Sort-free run builder (r8 continuation): accumulates the partition's
    * postings in an open-addressed (shard, term) map instead of requiring
    * a sorted stream — correct because the analyze stage emits documents
    * in ascending docId order, so each key's postings arrive ascending
    * (guarded per key). Emits runs sorted by (term, shard); emission
    * order is immaterial to the stored bytes anyway (the reduce side
    * re-sorts by (term, shard) for the parquet layout), and the encode
    * path is [[encodeRun]], shared with [[buildRuns]] — identical bytes.
    *
    * MEMORY: holds the whole partition's postings (~26 B + pos bytes per
    * posting) — the SORTED path bounds memory to one run and spills, so
    * the driver picks this path only when the observed tokens-per-shard
    * estimate fits [[AccumMaxPostings]] with headroom (see the postings
    * job); oversized shards keep the spillable sort. */
  def accumRuns(it: Iterator[TokenPosting]): Iterator[PostingRowPos] = {
    final class Acc(val shard: Int, val term: String) {
      val docs = new mutable.ArrayBuilder.ofLong
      val tfs = new mutable.ArrayBuilder.ofInt
      val dls = new mutable.ArrayBuilder.ofInt
      val poss = mutable.ArrayBuffer.empty[Array[Byte]]
      var hasPos = true
      var lastDoc = Long.MinValue
    }
    var cap = 1024
    var keys = new Array[Acc](cap)
    var size = 0
    def grow(): Unit = {
      val old = keys
      cap <<= 1
      keys = new Array[Acc](cap)
      val mask = cap - 1
      var i = 0
      while (i < old.length) {
        val a = old(i)
        if (a != null) {
          var j = (a.term.hashCode ^ (a.shard * 0x9e3779b9)) & mask
          while (keys(j) != null) j = (j + 1) & mask
          keys(j) = a
        }
        i += 1
      }
    }
    var held = 0L
    val hardCap =
      if (AccumMaxPostings > Long.MaxValue / 4) Long.MaxValue
      else 4L * AccumMaxPostings
    it.foreach { p =>
      // the driver-side budget heuristic (mean x2 + largest doc) chose
      // this path; a distribution pathological beyond that headroom must
      // fail LOUDLY with a remedy, not accumulate toward an executor OOM
      // the sorted path would have spilled through
      held += 1
      if (held > hardCap)
        throw new IllegalStateException(
          s"accumRuns exceeded $hardCap postings in one partition (shard " +
            s"${p.shard}) — token mass is skewed far beyond the build's " +
            "estimate; rebuild with more shards, or set " +
            "IndexBuilder.AccumMaxPostings = 0 to force the spillable " +
            "sorted postings path")
      if (((size + 1) << 1) >= cap) grow()
      val mask = cap - 1
      var j = (p.term.hashCode ^ (p.shard * 0x9e3779b9)) & mask
      while (keys(j) != null &&
             !(keys(j).shard == p.shard && keys(j).term == p.term))
        j = (j + 1) & mask
      var a = keys(j)
      if (a == null) {
        a = new Acc(p.shard, p.term)
        keys(j) = a
        size += 1
      }
      require(p.docId > a.lastDoc,
        s"accumRuns requires ascending docIds per (shard, term): " +
          s"${a.lastDoc} -> ${p.docId} for '${p.term}'@${p.shard}")
      a.lastDoc = p.docId
      a.docs += p.docId; a.tfs += p.tf; a.dls += p.dl; a.poss += p.pos
      if (p.pos.isEmpty) a.hasPos = false
    }
    val accs = new Array[Acc](size)
    var i = 0
    var k = 0
    while (i < cap) {
      if (keys(i) != null) { accs(k) = keys(i); k += 1 }
      i += 1
    }
    java.util.Arrays.sort(accs, new java.util.Comparator[Acc] {
      def compare(x: Acc, y: Acc): Int = {
        val c = x.term.compareTo(y.term)
        if (c != 0) c else Integer.compare(x.shard, y.shard)
      }
    })
    accs.iterator.map(a => encodeRun(a.shard, a.term, a.docs.result(),
      a.tfs.result(), a.dls.result(), a.poss, a.hasPos))
  }

  /** Per-task posting-accumulation budget for the sort-free postings
    * path (~26 B + position bytes per posting => ~130 MB at the default).
    * Mutable only as a test seam (forcing either path). */
  private[graft] var AccumMaxPostings: Long = 4L * 1000 * 1000

  /**
   * Build (or resume) one pass of the index for `corpus` under `root`.
   * The committed manifest is the ONLY checkpoint state: a pass that
   * crashes mid-build commits nothing, so resume re-runs exactly the
   * shards no committed segment covers (never trusting side files that a
   * crash between data write and commit could leave inconsistent).
   *
   * @param batch ingest batch id (0 = initial bulk build; streaming
   *              ingest increments it per micro-batch)
   * @param maxShardsThisPass checkpoint granularity for bulk builds: at
   *              most this many input shards are built and committed per
   *              call (use [[buildAll]] to loop passes to completion).
   */
  def build(spark: SparkSession, corpus: Dataset[CorpusDoc], root: String,
            numShards: Int, batch: Int = 0, resume: Boolean = true,
            maxShardsThisPass: Int = Int.MaxValue,
            tableIdOf: Option[CorpusDoc => Long] = None,
            positions: Boolean = true): BuildReport = {
    import spark.implicits._
    val tbl = new IcebergLite(root)
    tbl.init()
    val prev = tbl.currentManifest().getOrElse(Manifest(0, numShards, Nil, 0L, 0L))
    // appending a v4 segment to a pre-v4 root would stamp the merged
    // manifest v4 while old segments still lack posBlocks/tableId — gate
    // the resume/append path the same way readers are gated
    requireFormat(prev, root)
    require(prev.segments.isEmpty || prev.numShards == numShards,
      s"index at $root was created with numShards=${prev.numShards}")
    // resume=false exists for streaming re-delivery simulation (batch > 0,
    // where the lineage guard dedupes); a resume=false BULK build over an
    // index that already holds batch-0 documents would re-assign their
    // docIds — duplicates, not an overwrite. Fail loudly instead.
    require(resume || batch > 0 ||
        prev.segments.forall(s => IcebergLite.batch0Shards(s).isEmpty),
      s"bulk build with resume=false over $root would duplicate batch-0 " +
        "docIds; drop() the index first or build with resume=true")

    // idempotence for streaming re-delivery (W5): a batchId whose docs are
    // already in a committed segment is a no-op re-run. Checked against
    // the RAW stream id first ("origBatches" — survives rebase), then the
    // effective id ("batches", which compaction propagates) — a
    // micro-batch re-delivered after a merge OR a compact-and-rebase must
    // stay a no-op.
    if (batch > 0 && prev.segments.exists(s =>
        IcebergLite.origBatchesOf(s).contains(batch.toLong)))
      return BuildReport(prev, None, Nil, 0L)
    // effective batch id: raw stream id minus the manifest's batchBase
    // (0 until the first SegmentMerge.rebase). The docId budget check in
    // docIdFor applies to the EFFECTIVE id — rebase resets the headroom
    // without the stream resetting its own counter.
    val effBatch =
      if (batch == 0) 0
      else {
        val eff = batch.toLong - prev.batchBase
        require(eff > 0, s"ingest batch $batch predates the index's batch " +
          s"base ${prev.batchBase} and is not in any committed segment's " +
          "lineage — refusing to assign it a recycled effective id")
        // fail FAST on the docId budget, driver-side before any job runs
        // (docIdFor re-checks per row; see its scaladoc for the policy)
        require(eff < (1L << BatchBits),
          s"ingest batch $batch maps to effective id $eff, exceeding the " +
            s"${1 << BatchBits}-batch docId budget; run " +
            "SegmentMerge.rebase to compact and reset the batch base")
        eff.toInt
      }
    if (effBatch > 0 && prev.segments.exists(s =>
        IcebergLite.batchesOf(s).contains(effBatch)))
      return BuildReport(prev, None, Nil, 0L)

    val done: Set[Int] =
      if (resume && batch == 0) IcebergLite.completedShards(prev) else Set.empty
    val todo = (0 until numShards).filterNot(done).take(
      if (batch == 0) maxShardsThisPass else Int.MaxValue)
    if (todo.isEmpty)
      return BuildReport(prev, None, Nil, 0L)

    // 1. route + filter (completed shards never leave the scan), then make
    //    partitionId == shard and freeze within-partition order. When this
    //    pass builds EVERY shard (the bulk-build common case) the filter
    //    is a tautology — skip it so the scan does not pay a per-row
    //    murmur3 + set probe for nothing (r8).
    val preFiltered =
      if (todo.size == numShards) corpus
      else corpus
        .withColumn("__shard", shardExpr(numShards))
        .where(col("__shard").isin(todo.map(Integer.valueOf): _*))
        .drop("__shard")
    val routed = preFiltered
      .repartition(numShards, col("repo"), col("path"), col("commit"))
      .sortWithinPartitions("repo", "path", "commit")
      .as[CorpusDoc]

    // 2. single analysis pass: docIds, sha256, term freqs + positions
    val idOf = tableIdOf
    val withPos = positions
    val analyzed: Dataset[AnalyzedDoc] = routed.mapPartitions { it =>
      val shard = TaskContext.getPartitionId()
      var idx = 0L
      // ONE analyzer session per task: term Strings intern across the
      // partition's documents (a shard's docs repeat their vocabulary),
      // and the per-doc map/position buffers are reused (r8)
      val session = new CodeAnalyzer.AnalyzerSession
      it.map { d =>
        val id = docIdFor(effBatch, shard, idx)
        idx += 1
        // fused single-pass analysis (r8): term-sorted positions straight
        // from the analyzer — no intermediate Map/tuple churn per doc
        val (tps, dl) = session.termPositionsSorted(d.content)
        val terms = new Array[TermFreq](tps.length)
        var k = 0
        while (k < terms.length) {
          val (t, ps) = tps(k)
          terms(k) = TermFreq(t, ps.length,
            if (withPos) Codec.encodePositions(Array(ps))
            else Array.emptyByteArray)
          k += 1
        }
        // the declared table-id extraction runs HERE, once per doc at
        // build time — a malformed key fails the build loudly instead
        // of becoming a silent null join key at query time
        AnalyzedDoc(id, d.repo, d.path, d.commit, d.lang,
          sha256Hex(d.content), dl, terms,
          idOf.map(f => f(d)).getOrElse(-1L))
      }
    }.persist(StorageLevel.MEMORY_AND_DISK)

    // Named by the MONOTONIC manifest version, never by segment count:
    // compaction shrinks the count, so a count-derived name could collide
    // with (and mode=overwrite would clobber) a dir an older manifest
    // still references — breaking snapshot isolation on resume-after-merge.
    val segName = s"seg-$effBatch-${prev.version}"
    val segRoot = s"$root/$segName"

    // 2b. materialize the analysis once, then run the two independent
    //     segment writes CONCURRENTLY (driver-side parallel job
    //     submission — keeps all executor slots busy across the narrow
    //     tail of each stage). Jobs carry descriptions (guide §1.5) so
    //     the UI/listeners attribute build time per phase.
    spark.sparkContext.setJobDescription(s"graft-build $segName: analyze")
    // noop-sink materialization (guide §1.4): same full evaluation as
    // count() but one job with no aggregation final stage — every AQE
    // barrier here is SERIAL time both bench levels pay equally, which
    // is exactly what depresses the 2->8 scaling ratio (r8). The token
    // count rides this job via observe() and feeds the postings-path
    // choice below (no extra pass).
    val anObs = org.apache.spark.sql.Observation(s"analyze-$segName")
    analyzed.observe(anObs, sum("docLen").as("tokens"), max("docLen").as("maxDl"))
      .write.format("noop").mode("overwrite").save()
    def obsLong(k: String): Long = Option(anObs.get(k))
      .collect { case l: java.lang.Long => l.longValue
                 case i: java.lang.Integer => i.longValue }.getOrElse(0L)
    val passTokens = obsLong("tokens")
    val passMaxDl = obsLong("maxDl")

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    // shardOf(docId) as a codegen'd column (same bit arithmetic) — both
    // segment writes below stay pure Catalyst projections over the cached
    // analysis instead of deserializing AnalyzedDoc per row (r8)
    val shardCol = shardColOf(col("docId"))

    // 3. docmeta segment; doc/token metrics ride the write job via
    //    observe() (A11 stream-counter analogue) — no extra pass.
    val docObs = org.apache.spark.sql.Observation(s"docmeta-$segName")
    val docmetaJob = Future {
      spark.sparkContext.setJobDescription(s"graft-build $segName: docmeta")
      analyzed
        .select(col("docId"), col("repo"), col("path"), col("commit"),
          col("lang"), col("sha256"), col("docLen"), shardCol.as("shard"),
          col("tableId"))
        .observe(docObs, count(lit(1)).as("docs"), sum("docLen").as("tokens"))
        .write.mode("overwrite").parquet(s"$segRoot/docmeta")
    }

    // 4. postings: one MAP-ONLY job — runs are built and term-major
    //    sorted inside the analysis partition (partitionId == shard) and
    //    written directly, one file per shard. The old reduce
    //    (repartition on hash(shard, term) + re-sort) only re-established
    //    an order the map side already emits; dropping it removes the
    //    run shuffle, a job barrier and an AQE planning gap from every
    //    build (r8 continuation). Parquet row-group min/max pruning on
    //    `term` is unchanged: row groups are term-ranges within each
    //    file either way (files never had disjoint term spans — the old
    //    hash placement interleaved terms across files too).
    // Sort-free postings path decision (r8 continuation): the mean
    // tokens-per-built-shard (an upper bound on postings per partition —
    // tf >= 1) with 2x skew headroom, PLUS the largest single document
    // (hash-sharding scatters a repo's files uniformly, so the realistic
    // per-shard token-mass skew driver is one giant document landing
    // whole on one shard — maxDl rides the same observation for free),
    // must fit the accumulation budget; otherwise keep the spillable
    // in-stage sort. Decided DRIVER-side from the observation that rode
    // the analyze job — both paths share encodeRun and produce
    // byte-identical segments. (todo is non-empty here: build() returned
    // early above when there was nothing to build.)
    val accumOk =
      (passTokens / todo.size) * 2 + passMaxDl <= AccumMaxPostings
    val pstObs = org.apache.spark.sql.Observation(s"postings-$segName")
    val postingsJob = Future {
      spark.sparkContext.setJobDescription(s"graft-build $segName: postings")
      val exploded = analyzed
        // codegen explode instead of a typed flatMap: the flatMap
        // deserialized every AnalyzedDoc (nested term array) and
        // re-serialized one TokenPosting object per posting — the
        // projection keeps the whole fan-out inside Tungsten rows (r8)
        .select(col("docId"), col("docLen"), explode(col("terms")).as("t"))
        .select(shardCol.as("shard"), col("t.term").as("term"), col("docId"),
          col("t.tf").as("tf"), col("docLen").as("dl"), col("t.pos").as("pos"))
        .as[TokenPosting]
      // MAP-SIDE run build (r8, guide §2.3 "aggregate before you
      // shuffle"): partitionId == shard after the routing repartition,
      // so every (shard, term) posting run lives entirely inside one
      // analysis partition — build the runs right there. The shuffle
      // then carries one compressed row per (shard, term) instead of
      // one thin row per posting (bench corpus: ~6.4k rows vs ~10M).
      // Within budget, accumRuns groups by hash with no sort at all
      // (docIds arrive ascending per key — r8 continuation); above it,
      // the spillable in-stage SortExec + one-run-at-a-time buildRuns
      // keep the memory bound. Both key runs on (shard, term), so even
      // a multi-shard input partition (foreign corpora fed to build()
      // directly) stays correct.
      val runs =
        if (accumOk) exploded.mapPartitions(accumRuns)
        else exploded.sortWithinPartitions("term", "shard", "docId")
          .mapPartitions(buildRuns)
      // TERM-major row order (both run builders emit (term, shard)
      // ascending): parquet min/max stats on `term` then actually prune
      // row groups for the query path's term-IN filter (shard-major made
      // every row group span the whole term range — measured 30x slower
      // hot-term queries at 220k docs). Small row groups (4 MB) give the
      // pruning its granularity.
      runs
        .observe(pstObs, count(lit(1)).as("terms"), sum("df").as("postings"),
          sum("bytes").as("bytes"))
        .write.mode("overwrite")
        .option("parquet.block.size", (4 * 1024 * 1024).toString)
        .parquet(s"$segRoot/postings")
    }
    Await.result(docmetaJob, Duration.Inf)
    Await.result(postingsJob, Duration.Inf)
    val docCount = docObs.get("docs").asInstanceOf[Long]
    val tokCount = docObs.get("tokens").asInstanceOf[Long]
    val termRows = pstObs.get("terms").asInstanceOf[Long]
    val postingCount = pstObs.get("postings").asInstanceOf[Long]
    val byteCount = pstObs.get("bytes").asInstanceOf[Long]
    analyzed.unpersist()

    val seg = SegmentInfo(
      segId = prev.version, name = segName, shards = todo,
      metrics = SegmentMetrics(docCount, termRows, postingCount, byteCount),
      lineage = Map(
        "batch" -> effBatch.toString,
        "batches" -> effBatch.toString,
        "origBatches" -> batch.toString, // raw stream id, survives rebase
        "inputShards" -> todo.mkString(","),
        "source" -> "corpus(repo,path,commit,lang,content)",
        // whether docmeta.tableId is real in this segment — the match()
        // semi-join checks every segment carries it before keying on it
        "tableIds" -> tableIdOf.isDefined.toString,
        // whether posBlocks is real in this segment — phrase queries
        // check every segment carries positions before using them
        "positions" -> positions.toString) ++
        (if (batch == 0) Map("batch0Shards" -> todo.mkString(",")) else Map.empty))

    // 6. NOTE: no global dictionary on the ingest path — per-term global
    //    df is derived at query time (sum of sub-list dfs) or materialized
    //    by SegmentMerge compaction; keeps the build free of a second
    //    whole-postings aggregation per ingest batch.
    // a materialized dict (from an earlier compaction) no longer covers
    // the new segment's postings — new manifest falls back to derived dfs
    // until the next compaction re-materializes it.
    val manifest = Manifest(prev.version + 1, numShards,
      prev.segments :+ seg, prev.numDocs + docCount, prev.totalTokens + tokCount,
      dict = None, batchBase = prev.batchBase,
      format = Some(FormatVersion))

    // 7. atomic snapshot commit — the commit IS the per-pass checkpoint
    tbl.commit(manifest)
    BuildReport(manifest, Some(seg), todo, docCount)
  }

  /** Bulk build to completion in passes of `shardsPerPass` input shards,
    * committing a segment (= a durable checkpoint) after each pass. A
    * crash loses at most the current pass; re-calling buildAll resumes
    * from the committed manifest. Finer passes = finer checkpoints at the
    * cost of more (small) segments — SegmentMerge compacts afterwards. */
  def buildAll(spark: SparkSession, corpus: Dataset[CorpusDoc], root: String,
               numShards: Int, shardsPerPass: Int,
               tableIdOf: Option[CorpusDoc => Long] = None,
               positions: Boolean = true): BuildReport = {
    var rep = build(spark, corpus, root, numShards,
      maxShardsThisPass = shardsPerPass, tableIdOf = tableIdOf,
      positions = positions)
    var docs = rep.docs
    var built = rep.builtShards
    while (rep.builtShards.nonEmpty &&
           IcebergLite.completedShards(rep.manifest).size < numShards) {
      rep = build(spark, corpus, root, numShards,
        maxShardsThisPass = shardsPerPass, tableIdOf = tableIdOf,
        positions = positions)
      docs += rep.docs
      built = built ++ rep.builtShards
    }
    BuildReport(rep.manifest, rep.segment, built, docs)
  }
}

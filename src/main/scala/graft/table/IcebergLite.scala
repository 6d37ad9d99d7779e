package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import com.fasterxml.jackson.databind.{ObjectMapper, JsonNode}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import scala.jdk.CollectionConverters._

/** Per-segment build metrics — the north rule's "doc/term/byte metrics
  * emitted per segment" (ES analogue: per-shard/segment stats). */
final case class SegmentMetrics(docs: Long, terms: Long, postings: Long, bytes: Long)

/** One immutable index segment: a docmeta dir + a postings dir produced by
  * a single (possibly resumed) build pass, covering a set of input shards.
  * Lineage keys: `batches` = comma-joined ingest batch ids whose docs this
  * segment (transitively) contains; `batch0Shards` = the bulk-build input
  * shards it covers (drives resume). docId layout (IndexBuilder.docIdFor):
  * docId = (batch << 52) | (shard << 32) | localIdx — globally unique, so
  * segment merge never needs a docID remap. */
final case class SegmentInfo(segId: Int, name: String, shards: Seq[Int],
                             metrics: SegmentMetrics,
                             lineage: Map[String, String])

final case class Manifest(version: Int, numShards: Int, segments: Seq[SegmentInfo],
                          numDocs: Long, totalTokens: Long,
                          dict: Option[String] = None,
                          batchBase: Long = 0L,
                          format: Option[String] = None) {
  def avgdl: Double = if (numDocs == 0) 0.0 else totalTokens.toDouble / numDocs
}

/**
 * Iceberg-style metadata layer (no Iceberg runtime jar ships in this
 * sandbox — see SURVEY.md §7.0): immutable parquet data files + JSON
 * manifests + an atomically-committed snapshot pointer. Gives the pieces
 * the north rule needs from "tracked in Iceberg": immutable segments,
 * snapshot isolation for readers, resumable builds, and lineage
 * (input partition -> segment).
 *
 * Layout under an index root:
 *   snapshot.json                 -> {"manifest": "manifest-<v>.json"}
 *   manifest-<v>.json             -> Manifest (segments, metrics, lineage)
 *   seg-<k>/docmeta/<files>.parquet
 *   seg-<k>/postings/<files>.parquet
 *   dict-v<v>/<files>.parquet     -> global (term, df), materialized at
 *                                    compaction, referenced by manifest
 *
 * Commit protocol: write manifest-<v+1>.json, then atomic-rename a temp
 * snapshot over snapshot.json. Readers resolve snapshot -> manifest ->
 * segment paths; a crashed build leaves only unreachable files.
 * SINGLE WRITER assumed (one driver owns an index root at a time — the
 * streaming checkpoint/foreachBatch model): the rename is atomic for
 * readers, but two concurrent writers could last-write-win a version.
 * A production port onto real Iceberg inherits its optimistic-commit
 * conflict detection; this thin layer documents the assumption instead.
 *
 * Resume protocol (no side files): the committed manifest IS the
 * checkpoint. A bulk build commits one segment per pass, each recording
 * the input shards it covers in lineage("batch0Shards"); a crashed pass
 * commits nothing, so `completedShards` (derived purely from the current
 * manifest) is always consistent with the data files a reader can see.
 */
final class IcebergLite(val root: String) {
  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)
  private def p(parts: String*): Path = Paths.get(root, parts: _*)

  def exists: Boolean = Files.exists(p("snapshot.json"))

  def init(): Unit = Files.createDirectories(Paths.get(root))

  def currentManifest(): Option[Manifest] = {
    if (!exists) return None
    val snap = mapper.readTree(Files.readString(p("snapshot.json")))
    val mf = snap.get("manifest").asText()
    Some(readManifest(mf))
  }

  private def readManifest(name: String): Manifest = {
    val n = mapper.readTree(Files.readString(p(name)))
    Manifest(
      version = n.get("version").asInt(),
      numShards = n.get("numShards").asInt(),
      segments = n.get("segments").elements().asScala.map { s =>
        SegmentInfo(
          segId = s.get("segId").asInt(),
          name = s.get("name").asText(),
          shards = s.get("shards").elements().asScala.map(_.asInt()).toSeq,
          metrics = {
            val m = s.get("metrics")
            SegmentMetrics(m.get("docs").asLong(), m.get("terms").asLong(),
              m.get("postings").asLong(), m.get("bytes").asLong())
          },
          lineage = {
            val l = s.get("lineage")
            l.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
          })
      }.toSeq,
      numDocs = n.get("numDocs").asLong(),
      totalTokens = n.get("totalTokens").asLong(),
      dict = Option(n.get("dict")).filterNot(_.isNull).map(_.asText()),
      batchBase = Option(n.get("batchBase")).filterNot(_.isNull)
        .map(_.asLong()).getOrElse(0L),
      format = Option(n.get("format")).filterNot(_.isNull).map(_.asText()))
  }

  /** Atomic snapshot commit: manifest file then rename-over pointer. */
  def commit(m: Manifest): Unit = {
    Files.createDirectories(Paths.get(root))
    val mfName = s"manifest-${m.version}.json"
    val base: Map[String, Any] = Map(
      "version" -> m.version, "numShards" -> m.numShards,
      "numDocs" -> m.numDocs, "totalTokens" -> m.totalTokens,
      "batchBase" -> m.batchBase,
      "segments" -> m.segments.map(s => Map(
        "segId" -> s.segId, "name" -> s.name, "shards" -> s.shards,
        "metrics" -> Map("docs" -> s.metrics.docs, "terms" -> s.metrics.terms,
          "postings" -> s.metrics.postings, "bytes" -> s.metrics.bytes),
        "lineage" -> s.lineage)))
    val withDict = m.dict.fold(base)(d => base + ("dict" -> d))
    val full = m.format.fold(withDict)(f => withDict + ("format" -> f))
    Files.writeString(p(mfName),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(full))
    val tmp = p(s"snapshot.json.tmp-${m.version}")
    Files.writeString(tmp, mapper.writeValueAsString(Map("manifest" -> mfName)))
    Files.move(tmp, p("snapshot.json"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Bulk-build shards already committed, derived from the CURRENT
    * manifest only (never from side files a crash could leave stale —
    * a shard counts as done iff a committed, reader-visible segment
    * contains its batch-0 documents). */
  def completedShards(): Set[Int] =
    currentManifest().map(IcebergLite.completedShards).getOrElse(Set.empty)

  /** S12 index delete as an API: retract the snapshot pointer FIRST (new
    * readers immediately see "no table"; an engine pinned to an already-
    * resolved manifest keeps its immutable files until the dir removal),
    * then remove the data. Idempotent. */
  def drop(): Unit = {
    Files.deleteIfExists(p("snapshot.json"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** Manifest version from a file name, None for anything that doesn't
    * parse cleanly (editor backups, foreign files): GC must SKIP those,
    * not abort on a NumberFormatException before deleting anything. */
  private def manifestVersion(name: String): Option[Int] =
    if (name.startsWith("manifest-") && name.endsWith(".json"))
      name.stripPrefix("manifest-").stripSuffix(".json").toIntOption
    else None

  /** Physical GC after compaction: keep the `keepManifests` most recent
    * manifest versions (snapshot history horizon); delete segment dirs,
    * dict dirs and manifest files only reachable from older versions,
    * plus orphaned `snapshot.json.tmp-*` files a crash between the temp
    * write and the atomic rename can leave behind. Readers pinned to a
    * kept manifest stay correct; pins older than the horizon are
    * invalidated by design (documented retention contract). */
  def gc(keepManifests: Int = 1): Seq[String] = {
    val current = currentManifest().getOrElse(return Nil)
    val listing = Files.list(Paths.get(root))
    val all = try listing.iterator().asScala.map(_.getFileName.toString).toSeq
              finally listing.close() // Files.list leaks an fd unless closed
    val manifestVersions = all.flatMap(manifestVersion).sorted
    val keepVs = manifestVersions.takeRight(math.max(1, keepManifests))
      .toSet + current.version
    val keptManifests = keepVs.map(v => readManifest(s"manifest-$v.json"))
    val liveDirs: Set[String] =
      keptManifests.flatMap(m => m.segments.map(_.name) ++ m.dict)
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    all.foreach { name =>
      val isOldManifest = manifestVersion(name).exists(!keepVs.contains(_))
      val isDeadDir = (name.startsWith("seg-") || name.startsWith("dict-v")) &&
        !liveDirs.contains(name)
      // a tmp snapshot only exists between its write and the atomic
      // rename in commit(); any still on disk at GC time is crash debris
      val isOrphanTmp = name.startsWith("snapshot.json.tmp-")
      if (isOldManifest || isDeadDir || isOrphanTmp) {
        org.apache.commons.io.FileUtils.deleteQuietly(p(name).toFile)
        deleted += name
      }
    }
    deleted.toSeq
  }

  def segPath(seg: SegmentInfo, sub: String): String =
    Paths.get(root, seg.name, sub).toString
}

object IcebergLite {
  /** EFFECTIVE ingest batch ids (raw stream id minus the manifest's
    * batchBase) whose documents a segment contains ("batches" after a
    * merge; "batch" on freshly built segments). These are the ids baked
    * into the segment's docIds. */
  def batchesOf(s: SegmentInfo): Set[Int] =
    s.lineage.get("batches").orElse(s.lineage.get("batch")).toSeq
      .flatMap(_.split(",")).filter(_.nonEmpty).map(_.trim.toInt).toSet

  /** RAW stream batch ids ever ingested into a segment — unchanged by a
    * rebase, so a micro-batch re-delivered after compact-and-rebase is
    * still recognized as a no-op. Stored RANGE-ENCODED ("0-2047,2050"):
    * contiguous stream ids would otherwise bloat the manifest by one
    * entry per micro-batch forever. Falls back to the effective ids for
    * segments written before this lineage key existed (those predate any
    * rebase, where raw == effective). */
  def origBatchesOf(s: SegmentInfo): Set[Long] =
    s.lineage.get("origBatches") match {
      case Some(v) => decodeRanges(v)
      case None => batchesOf(s).map(_.toLong)
    }

  /** "0-3,7,9-11" <-> Set(0,1,2,3,7,9,10,11). */
  def encodeRanges(ids: Set[Long]): String = {
    if (ids.isEmpty) return ""
    val sorted = ids.toSeq.sorted
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var lo = sorted.head
    var hi = sorted.head
    sorted.tail.foreach { x =>
      if (x == hi + 1) hi = x
      else { spans += ((lo, hi)); lo = x; hi = x }
    }
    spans += ((lo, hi))
    spans.map { case (a, b) => if (a == b) s"$a" else s"$a-$b" }.mkString(",")
  }

  def decodeRanges(v: String): Set[Long] =
    v.split(",").filter(_.nonEmpty).flatMap { span =>
      span.split("-") match {
        case Array(a) => Seq(a.trim.toLong)
        case Array(a, b) => a.trim.toLong to b.trim.toLong
        case _ => throw new IllegalArgumentException(s"bad range '$span'")
      }
    }.toSet

  /** Bulk-build (batch 0) input shards covered by a segment. */
  def batch0Shards(s: SegmentInfo): Set[Int] =
    s.lineage.get("batch0Shards") match {
      case Some(v) => v.split(",").filter(_.nonEmpty).map(_.trim.toInt).toSet
      case None => if (batchesOf(s).contains(0)) s.shards.toSet else Set.empty
    }

  def completedShards(m: Manifest): Set[Int] =
    m.segments.flatMap(batch0Shards).toSet
}

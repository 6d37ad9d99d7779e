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
  * `segId` feeds the docId layout: docId = (segId<<50)|(shard<<40)|localIdx
  * — globally unique, so segment merge never needs a docID remap. */
final case class SegmentInfo(segId: Int, name: String, shards: Seq[Int],
                             metrics: SegmentMetrics,
                             lineage: Map[String, String])

final case class Manifest(version: Int, numShards: Int, segments: Seq[SegmentInfo],
                          numDocs: Long, totalTokens: Long) {
  def avgdl: Double = if (numDocs == 0) 0.0 else totalTokens.toDouble / numDocs
}

/**
 * Iceberg-style metadata layer (no Iceberg runtime jar ships in this
 * sandbox — see SURVEY.md §7.0): immutable parquet data files + JSON
 * manifests + an atomically-committed snapshot pointer. Gives the pieces
 * the north rule needs from "tracked in Iceberg": immutable segments,
 * snapshot isolation for readers, resumable builds via per-shard
 * checkpoint records, and lineage (input partition -> segment).
 *
 * Layout under an index root:
 *   snapshot.json                 -> {"manifest": "manifest-<v>.json"}
 *   manifest-<v>.json             -> Manifest (segments, metrics, lineage)
 *   checkpoints/shard-<n>.json    -> per-input-shard completion record
 *   seg-<k>/docmeta/<files>.parquet
 *   seg-<k>/postings/<files>.parquet
 *   dict/<files>.parquet                -> global (term, df) stats
 *
 * Commit protocol: write manifest-<v+1>.json, then atomic-rename a temp
 * snapshot over snapshot.json. Readers resolve snapshot -> manifest ->
 * segment paths; a crashed build leaves only unreachable files.
 */
final class IcebergLite(val root: String) {
  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)
  private def p(parts: String*): Path = Paths.get(root, parts: _*)

  def exists: Boolean = Files.exists(p("snapshot.json"))

  def init(): Unit = Files.createDirectories(p("checkpoints"))

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
      totalTokens = n.get("totalTokens").asLong())
  }

  /** Atomic snapshot commit: manifest file then rename-over pointer. */
  def commit(m: Manifest): Unit = {
    Files.createDirectories(Paths.get(root))
    val mfName = s"manifest-${m.version}.json"
    Files.writeString(p(mfName), mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(Map(
        "version" -> m.version, "numShards" -> m.numShards,
        "numDocs" -> m.numDocs, "totalTokens" -> m.totalTokens,
        "segments" -> m.segments.map(s => Map(
          "segId" -> s.segId, "name" -> s.name, "shards" -> s.shards,
          "metrics" -> Map("docs" -> s.metrics.docs, "terms" -> s.metrics.terms,
            "postings" -> s.metrics.postings, "bytes" -> s.metrics.bytes),
          "lineage" -> s.lineage)))))
    val tmp = p(s"snapshot.json.tmp-${m.version}")
    Files.writeString(tmp, mapper.writeValueAsString(Map("manifest" -> mfName)))
    Files.move(tmp, p("snapshot.json"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Per-input-shard checkpoint records (resume = skip completed shards). */
  def completedShards(): Set[Int] = {
    val dir = p("checkpoints")
    if (!Files.exists(dir)) return Set.empty
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("shard-") && s.endsWith(".json") =>
        s.stripPrefix("shard-").stripSuffix(".json").toInt }
      .toSet
  }

  def checkpointShard(shard: Int, segName: String, docs: Long): Unit = {
    Files.createDirectories(p("checkpoints"))
    Files.writeString(p("checkpoints", s"shard-$shard.json"),
      mapper.writeValueAsString(Map(
        "shard" -> shard, "segment" -> segName, "docs" -> docs)))
  }

  def segPath(seg: SegmentInfo, sub: String): String =
    Paths.get(root, seg.name, sub).toString
  def dictPath: String = Paths.get(root, "dict").toString
}

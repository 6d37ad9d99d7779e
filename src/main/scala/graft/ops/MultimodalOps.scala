package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: media as opaque `binary` columns with typed
 * metadata, processed batch-wise per partition. The Spark-side contract
 * (schema, partitioning, batch shape) is real and tested; the actual
 * codec decode is STUBBED — this container has no image/audio libraries,
 * so `decodeStub` parses a deterministic fake header instead of calling a
 * real decoder. The seam to swap in a real decoder is the single
 * `decodeStub` function.
 */
object MultimodalOps {
  import Tables._

  val Magic: Array[Byte] = "GFT0".getBytes("UTF-8")

  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])
  final case class MediaMeta(doc_id: Long, kind: String, width: Int,
                             height: Int, n_bytes: Long, feature: Seq[Double])

  /** Synthesize a fake media binary for a document: 4-byte magic,
    * 4-byte width, 4-byte height, then payload bytes. Deterministic. */
  def encodeFake(docId: Long, kind: String, payload: Array[Byte]): Array[Byte] = {
    val w = 64 + ((docId * 2654435761L) % 192).toInt.abs
    val h = 64 + ((docId * 40503L) % 192).toInt.abs
    val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
    bb.put(Magic).putInt(w).putInt(h).put(payload)
    bb.array()
  }

  /**
   * ??? REAL DECODER GOES HERE ??? — stub: reads the fake header and
   * derives an 8-dim "feature vector" from payload byte statistics.
   * A real implementation would decode the image/audio and run feature
   * extraction per batch; the signature and batch shape stay the same.
   */
  def decodeStub(docId: Long, kind: String, media: Array[Byte]): MediaMeta = {
    val bb = java.nio.ByteBuffer.wrap(media)
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(java.util.Arrays.equals(magic, Magic), "bad media header")
    val w = bb.getInt
    val h = bb.getInt
    val payload = new Array[Byte](media.length - 12)
    bb.get(payload)
    val feat = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      feat(i % 8) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    val n = math.max(1, payload.length / 8)
    MediaMeta(docId, kind, w, h, media.length.toLong,
      feat.map(f => math.rint(f / n * 10000) / 10000).toSeq)
  }

  /** documents -> fake media table -> per-partition batched decode ->
    * typed metadata. mapPartitions keeps the batch shape of a real
    * vectorized decode (one decoder init per partition, not per row).
    * Output = the HEADER fields (deterministic arithmetic a SQL oracle
    * reproduces: encode -> decode roundtrip is hash-verified); the
    * derived feature vector is exercised by OpsSpec (byte-level math a
    * SQL engine can't reach). */
  def qMediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        // decoder/codec init would happen once per partition here
        it.map { case (id, lang, text) =>
          val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
          val media = encodeFake(id, kind, text.getBytes("UTF-8"))
          decodeStub(id, kind, media)
        }
      }
      .select(col("doc_id"), col("kind"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("n_bytes"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle: the fake header arithmetic + UTF-8 payload size. */
  def mediaMetaOracleSql: String =
    """SELECT doc_id,
      | CASE WHEN doc_id % 3 = 0 THEN 'image'
      |      WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      | 64 + abs((doc_id * 2654435761) % 192) AS width,
      | 64 + abs((doc_id * 40503) % 192) AS height,
      | 12 + octet_length(encode(text)) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin
}

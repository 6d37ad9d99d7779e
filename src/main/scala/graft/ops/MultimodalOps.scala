package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: media as opaque `binary` columns with typed
 * metadata, processed batch-wise per partition.
 *
 * The decode step is REAL for the codec-free formats: 16-bit PCM WAV
 * (graft.media.Wav — chunk-walking RIFF parser) and binary PPM
 * (graft.media.Ppm — full P6 header grammar incl. comments), with real
 * feature extraction (RMS/zero-crossings/peak over decoded samples;
 * nearest-neighbor luminance resize over decoded pixels). Both
 * pipelines are exactly DuckDB-oracled end-to-end (q71/q72): the
 * payloads are synthesized from integer arithmetic, so the oracle
 * recomputes the features from the SAME formulas — if the decoder
 * misparses a single byte, the hashes diverge.
 *
 * COMPRESSED codecs (JPEG/PNG/MP3/H.264...) remain the documented seam:
 * no codec libraries ship in this container, so `decodeStub` (q70)
 * keeps the original fake-header path to show the batch shape a
 * vectorized external decoder would plug into.
 */
object MultimodalOps {
  import Tables._
  import graft.media.{Ppm, Wav}

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
      // r8: sort the narrow scan BEFORE the opaque decode — a global
      // sort's range sampling evaluates its child, so sorting after the
      // mapPartitions ran the whole decode twice; the 1:1 in-order map
      // preserves the sorted order (same rows, same output order)
      .orderBy("doc_id")
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

  // ---- REAL audio path (q71): synthesize PCM-WAV bytes from integer
  // arithmetic, round-trip them through the real RIFF encoder/decoder,
  // extract features from the DECODED samples. ------------------------

  val WavRate = 8000

  /** Sawtooth-ish integer sample i for a doc: nonneg operands only, so
    * Scala % == SQL % (the oracle repeats this formula verbatim). */
  private def wavSample(docId: Long, k: Long, i: Long): Int =
    ((i * k + docId) % 65536L - 32768L).toInt

  def synthWav(docId: Long, nChars: Long): Array[Byte] = {
    val n = (256L + nChars % 512L).toInt
    val k = 37L + docId % 91L
    val samples = Array.tabulate(n)(i => wavSample(docId, k, i).toShort)
    Wav.encode(WavRate, 1, samples)
  }

  /** documents -> real WAV bytes -> chunk-walk decode -> integer-exact
    * features. Everything after `synthWav` is the path real external
    * audio would take. */
  def qWavFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id") // sort narrow before the decode (see qMediaMeta, r8)
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val decoded = Wav.decode(synthWav(id, nChars))
          val f = Wav.features(decoded)
          (id, f.nSamples, decoded.durationMs, f.rms, f.zeroCrossings,
            f.peak.toLong)
        }
      }
      .toDF("doc_id", "n_samples", "duration_ms", "rms_raw",
        "zero_crossings", "peak")
      .select(col("doc_id"), col("n_samples"), col("duration_ms"),
        rd(col("rms_raw"), 4).as("rms"), col("zero_crossings"), col("peak"))
  }

  /** The oracle recomputes every feature from the synthesis formula —
    * pure integer arithmetic plus one double sqrt, bit-identical. */
  def wavFeaturesOracleSql: String = {
    val v = "((i * k + doc_id) % 65536 - 32768)"
    val vs = s"list_transform(range(n), i -> $v)"
    s"""WITH d AS (SELECT doc_id, 256 + (n_chars % 512) AS n,
       |                  37 + doc_id % 91 AS k FROM documents),
       |f AS (SELECT doc_id, n, k, $vs AS vs FROM d),
       |g AS (SELECT doc_id, n,
       |        list_reduce(list_transform(vs, v -> v * v), (a, b) -> a + b) AS sumsq,
       |        list_aggregate(list_transform(vs, v -> abs(v)), 'max') AS peak,
       |        coalesce(list_reduce(list_transform(range(n - 1), i ->
       |          CASE WHEN (vs[i + 1] < 0) <> (vs[i + 2] < 0)
       |               THEN 1::BIGINT ELSE 0::BIGINT END),
       |          (a, b) -> a + b), 0) AS zero_crossings
       |      FROM f)
       |SELECT doc_id, n AS n_samples, n * 1000 // $WavRate AS duration_ms,
       |  ${Tables.rdSql("sqrt(CAST(sumsq AS DOUBLE) / n)", 4)} AS rms,
       |  zero_crossings, peak
       |FROM g ORDER BY doc_id""".stripMargin
  }

  // ---- REAL image path (q72): synthesize P6 PPM bytes (header WITH a
  // comment line, exercising the real grammar), decode, nearest-neighbor
  // luminance resize — all integer math. ------------------------------

  val PpmGrid = 4

  /** ONE pixel formula for both image (f = 0) and video (frame f)
    * syntheses — q72's and q73's oracle SQL restate it, so a single
    * definition keeps the Scala and both oracles in lockstep. */
  private def framePixel(docId: Long, f: Int, x: Int, y: Int, c: Int): Int =
    (c match {
      case 0 => (x * 7 + y * 13 + docId + f * 31) % 256
      case 1 => (x * 3 + y * 5 + docId * 2 + f * 17) % 256
      case _ => (x + y + f) % 256
    }).toInt

  private def fillRgb(w: Int, h: Int, px: (Int, Int, Int) => Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          rgb((y * w + x) * 3 + c) = px(x, y, c).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    rgb
  }

  def synthPpm(docId: Long): Array[Byte] = {
    val w = (16 + docId % 17).toInt
    val h = (16 + docId % 13).toInt
    val rgb = fillRgb(w, h, (x, y, c) => framePixel(docId, 0, x, y, c))
    // header with a comment: the decoder must handle the full grammar
    val header = s"P6\n# graft synthetic $docId\n$w $h\n255\n"
      .getBytes("US-ASCII")
    header ++ rgb
  }

  /** documents -> real PPM bytes -> P6 decode -> 4x4 nearest-neighbor
    * luminance grid (the thumbnail/feature-extraction shape). */
  def qPpmGrid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"))
      .orderBy("doc_id") // sort narrow before the decode (see qMediaMeta, r8)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val img = Ppm.decode(synthPpm(id))
          // comma-joined scalar (not array<long>): the driver comparator
          // sorts/hashes every column and cannot handle array cells
          (id, img.width.toLong, img.height.toLong,
            Ppm.resizeLuminance(img, PpmGrid).mkString(","))
        }
      }
      .toDF("doc_id", "width", "height", "grid")
  }

  // ---- REAL video path (q73): frame-sequence container -> stride
  // sampling (skipped frames are never pixel-decoded) -> per-sampled-
  // frame mean luminance. ---------------------------------------------

  val FrameStride = 2

  def synthVideo(docId: Long): Array[Byte] = {
    val w = (8 + docId % 5).toInt
    val h = (8 + docId % 3).toInt
    val nFrames = (4 + docId % 5).toInt
    val frames = (0 until nFrames).map { f =>
      val rgb = fillRgb(w, h, (x, y, c) => framePixel(docId, f, x, y, c))
      graft.media.Ppm.encode(graft.media.Ppm.Image(w, h, rgb))
    }
    graft.media.FrameSeq.encode(frames)
  }

  /** documents -> real frame-sequence bytes -> stride-2 sample (the
    * skipped frames stay undecoded) -> mean luminance per kept frame. */
  def qFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"))
      .orderBy("doc_id") // sort narrow before the decode (see qMediaMeta, r8)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val bytes = synthVideo(id)
          val sampled = graft.media.FrameSeq.sample(bytes, FrameStride)
          // comma-joined scalar for the same comparator reason as qPpmGrid
          (id, graft.media.FrameSeq.frameCount(bytes).toLong,
            sampled.size.toLong,
            sampled.map(img => Ppm.meanLuminance(img)).mkString(","))
        }
      }
      .toDF("doc_id", "n_frames", "n_sampled", "mean_lums")
  }

  def frameSampleOracleSql: String = {
    val x = "(p % w)"
    val y = "(p // w)"
    val lum = s"(299 * (($x * 7 + $y * 13 + doc_id + f * 31) % 256) + " +
      s"587 * (($x * 3 + $y * 5 + doc_id * 2 + f * 17) % 256) + " +
      s"114 * (($x + $y + f) % 256)) // 1000"
    s"""WITH d AS (SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h,
       |                  4 + doc_id % 5 AS nf FROM documents),
       |s AS (SELECT doc_id, w, h, nf,
       |        list_filter(range(nf), f -> f % $FrameStride = 0) AS kept
       |      FROM d)
       |SELECT doc_id, nf AS n_frames, len(kept) AS n_sampled,
       |  array_to_string(list_transform(kept, f ->
       |    list_reduce(list_transform(range(w * h), p -> $lum),
       |                (a, b) -> a + b) // (w * h)), ',') AS mean_lums
       |FROM s ORDER BY doc_id""".stripMargin
  }

  def ppmGridOracleSql: String = {
    // sx = (g%4)*w/4, sy = (g/4)*h/4, all integer division
    val sx = s"(((g % $PpmGrid) * width) // $PpmGrid)"
    val sy = s"(((g // $PpmGrid) * height) // $PpmGrid)"
    val lum = s"(299 * (($sx * 7 + $sy * 13 + doc_id) % 256) + " +
      s"587 * (($sx * 3 + $sy * 5 + doc_id * 2) % 256) + " +
      s"114 * (($sx + $sy) % 256)) // 1000"
    s"""WITH d AS (SELECT doc_id, 16 + doc_id % 17 AS width,
       |                  16 + doc_id % 13 AS height FROM documents)
       |SELECT doc_id, width, height,
       |  array_to_string(list_transform(range(${PpmGrid * PpmGrid}),
       |                                 g -> $lum), ',') AS grid
       |FROM d ORDER BY doc_id""".stripMargin
  }
}

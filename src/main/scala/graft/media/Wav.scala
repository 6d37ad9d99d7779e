package graft.media

import java.nio.{ByteBuffer, ByteOrder}

/** PCM WAV (RIFF) encode/decode in pure JVM byte arithmetic — a REAL
  * container parser (chunk walk, so files with LIST/fact/extra chunks
  * decode too), not a stub: any standard 16-bit PCM WAV from outside
  * parses with it. Compressed audio (MP3/AAC/...) stays out of scope —
  * no codec libraries ship in this environment (the documented seam in
  * MultimodalOps).
  *
  * Reference behavior: stocksight treats media URLs as opaque strings
  * (/root/reference/sentiment.py:424 strips them); the training-data
  * extension makes the binary payload a first-class column instead.
  */
object Wav {
  final case class WavData(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           samples: Array[Short]) {
    def nSamples: Int = samples.length / channels
    def durationMs: Long = nSamples.toLong * 1000L / sampleRate
  }

  /** Standard 44-byte-header RIFF/WAVE, PCM 16-bit little-endian. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Chunk-walking decoder: accepts any chunk order / unknown chunks
    * between fmt and data (real-world WAVs carry LIST/INFO/fact).
    * Rejects non-RIFF, non-PCM and non-16-bit payloads loudly. */
  def decode(bytes: Array[Byte]): WavData = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    bb.getInt // riff size (unreliable in the wild; chunk walk instead)
    require(tag() == "WAVE", "not a WAVE file")
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var data: Array[Byte] = null
    while (bb.remaining() >= 8 && (data == null || sampleRate < 0)) {
      val id = tag()
      val len = bb.getInt
      // a negative length is always corruption (and would walk the
      // buffer backwards into an infinite loop)
      require(len >= 0, s"negative length $len for chunk '$id'")
      id match {
        case "fmt " =>
          require(len >= 16 && bb.remaining() >= 16,
            s"fmt chunk too short ($len bytes)")
          val fmtStart = bb.position()
          val audioFormat = bb.getShort
          require(audioFormat == 1,
            s"only PCM supported (format $audioFormat); compressed audio is the documented codec seam")
          channels = bb.getShort
          require(channels >= 1, s"invalid channel count $channels")
          sampleRate = bb.getInt
          bb.getInt   // byte rate
          bb.getShort // block align
          bits = bb.getShort
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          // Long arithmetic like the default branch: a crafted len near
          // Int.MaxValue must clamp, not overflow negative
          bb.position(math.min(
            fmtStart.toLong + len + (len & 1), bytes.length.toLong).toInt)
        case "data" =>
          // truncated payload is a LOUD reject (silently clamping would
          // compute features over a partial signal)
          require(len <= bb.remaining(),
            s"truncated data chunk: declared $len, have ${bb.remaining()}")
          data = new Array[Byte](len)
          bb.get(data)
          if ((len & 1) == 1 && bb.hasRemaining) bb.get()
        case _ => // LIST / fact / anything else: skip (padded to even;
          // a truncated TRAILING unknown chunk just ends the walk)
          bb.position(math.min(
            bb.position().toLong + len + (len & 1), bytes.length.toLong).toInt)
      }
    }
    require(sampleRate > 0 && data != null, "missing fmt or data chunk")
    val sb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val samples = new Array[Short](data.length / 2)
    var i = 0
    while (i < samples.length) { samples(i) = sb.getShort; i += 1 }
    WavData(sampleRate, channels, bits, samples)
  }

  /** Integer-exact audio features over decoded samples (mono view:
    * channel 0). sumSquares/zero-crossings are pure integer arithmetic,
    * so a SQL oracle reproduces them bit-for-bit; rms is one double
    * sqrt at the end. */
  final case class AudioFeatures(nSamples: Long, sumSquares: Long,
                                 zeroCrossings: Long, peak: Int) {
    def rms: Double =
      if (nSamples == 0) 0.0 else math.sqrt(sumSquares.toDouble / nSamples)
  }

  def features(w: WavData): AudioFeatures = {
    val step = w.channels
    var i = 0
    var ss = 0L
    var zc = 0L
    var peak = 0
    var prev = 0
    var first = true
    while (i < w.samples.length) {
      val s = w.samples(i).toInt
      ss += s.toLong * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (!first && ((prev < 0 && s >= 0) || (prev >= 0 && s < 0))) zc += 1
      prev = s
      first = false
      i += step
    }
    AudioFeatures(w.nSamples.toLong, ss, zc, peak)
  }
}

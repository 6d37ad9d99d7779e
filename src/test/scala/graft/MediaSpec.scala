package graft

import graft.media.{Ppm, Wav}
import graft.ops.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** The REAL media decoders: these must parse standard files from the
  * wild (chunk-walked RIFF, full P6 header grammar), not just our own
  * encoder's output. */
class MediaSpec extends AnyFunSuite with SparkSessionFixture {

  test("WAV roundtrip: encode -> decode recovers rate, channels, samples") {
    val samples = Array.tabulate(1000)(i => ((i * 37) % 65536 - 32768).toShort)
    val w = Wav.decode(Wav.encode(44100, 1, samples))
    assert(w.sampleRate == 44100 && w.channels == 1 && w.bitsPerSample == 16)
    assert(w.samples.toSeq == samples.toSeq)
    assert(w.durationMs == 1000L * 1000L / 44100L)
  }

  test("WAV chunk walk: LIST/INFO chunks between fmt and data are skipped") {
    val samples = Array[Short](100, -200, 300, -400, 0)
    val plain = Wav.encode(8000, 1, samples)
    // splice a LIST chunk (odd-length payload -> exercises even padding)
    // between the fmt chunk (ends at byte 36) and the data chunk
    val listPayload = "INFOIART".getBytes("US-ASCII") ++ Array[Byte](7)
    val bb = java.nio.ByteBuffer.allocate(plain.length + 8 + listPayload.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(plain, 0, 36)
    bb.put("LIST".getBytes("US-ASCII")).putInt(listPayload.length)
    bb.put(listPayload).put(0.toByte) // pad to even
    bb.put(plain, 36, plain.length - 36)
    val w = Wav.decode(bb.array())
    assert(w.sampleRate == 8000 && w.samples.toSeq == samples.toSeq)
  }

  test("WAV rejects non-PCM and truncated input loudly") {
    val good = Wav.encode(8000, 1, Array[Short](1, 2, 3))
    val nonPcm = good.clone()
    nonPcm(20) = 3 // audioFormat = IEEE float
    assert(intercept[IllegalArgumentException](Wav.decode(nonPcm))
      .getMessage.contains("PCM"))
    assert(intercept[IllegalArgumentException](
      Wav.decode("RIFFxxxxJUNK".getBytes("US-ASCII"))).getMessage.nonEmpty)
  }

  test("malformed-input hardening: negative lengths, zero channels, wrapped dims") {
    import java.nio.{ByteBuffer, ByteOrder}
    val good = Wav.encode(8000, 1, Array[Short](1, 2, 3))
    // negative chunk length must not walk the buffer backwards (hang)
    val negLen = good.clone()
    ByteBuffer.wrap(negLen).order(ByteOrder.LITTLE_ENDIAN).putInt(16, -8)
    assert(intercept[IllegalArgumentException](Wav.decode(negLen))
      .getMessage.contains("negative length"))
    // zero channels would make the feature loop never advance
    val zeroCh = good.clone()
    ByteBuffer.wrap(zeroCh).order(ByteOrder.LITTLE_ENDIAN).putShort(22, 0)
    assert(intercept[IllegalArgumentException](Wav.decode(zeroCh))
      .getMessage.contains("channel"))
    // truncated data chunk: LOUD reject, never silently-partial features
    assert(intercept[IllegalArgumentException](
      Wav.decode(good.dropRight(2))).getMessage.contains("truncated data"))
    // 65536 x 65536 wraps w*h*3 past Int: must reject, not "decode"
    val wrapped = "P6\n65536 65536\n255\n".getBytes("US-ASCII") ++
      new Array[Byte](16)
    assert(intercept[IllegalArgumentException](Ppm.decode(wrapped))
      .getMessage.contains("too large"))
    // negative frame count: corrupt, not an empty video
    val negFrames = graft.media.FrameSeq.encode(Nil).clone()
    ByteBuffer.wrap(negFrames).putInt(4, -1)
    assert(intercept[IllegalArgumentException](
      graft.media.FrameSeq.frameCount(negFrames))
      .getMessage.contains("negative frame count"))
  }

  test("audio features are integer-exact on a known signal") {
    // square wave +1000/-1000, 8 samples: rms = 1000, 7 sign flips
    val sq = Array.tabulate(8)(i => if (i % 2 == 0) 1000 else -1000)
      .map(_.toShort)
    val f = Wav.features(Wav.decode(Wav.encode(8000, 1, sq)))
    assert(f.nSamples == 8 && f.peak == 1000 && f.zeroCrossings == 7)
    assert(math.abs(f.rms - 1000.0) < 1e-9)
    assert(f.sumSquares == 8L * 1000L * 1000L)
  }

  test("PPM roundtrip + comment/whitespace grammar") {
    val img = Ppm.Image(3, 2, Array.tabulate(18)(i => (i * 11 % 256).toByte))
    assert(Ppm.decode(Ppm.encode(img)).rgb.toSeq == img.rgb.toSeq)
    // hand-built header: comments and mixed whitespace are legal P6
    val nasty = ("P6 # trailing comment\n#full comment line\n  3\t2 #dims\n" +
      "255\n").getBytes("US-ASCII") ++ img.rgb
    val d = Ppm.decode(nasty)
    assert(d.width == 3 && d.height == 2 && d.rgb.toSeq == img.rgb.toSeq)
  }

  test("PPM rejects truncated raster and non-255 maxval") {
    val img = Ppm.Image(4, 4, new Array[Byte](48))
    val enc = Ppm.encode(img)
    assert(intercept[IllegalArgumentException](
      Ppm.decode(enc.dropRight(5))).getMessage.contains("truncated"))
    val sixteenBit = "P6\n2 2\n65535\n".getBytes("US-ASCII") ++
      new Array[Byte](24)
    assert(intercept[IllegalArgumentException](
      Ppm.decode(sixteenBit)).getMessage.contains("maxval"))
  }

  test("nearest-neighbor luminance resize: exact integer mapping") {
    // 8x4 image, resize to 4x4: sx = gx*8/4 = 2*gx, sy = gy*4/4 = gy
    val rgb = new Array[Byte](8 * 4 * 3)
    val img = Ppm.Image(8, 4, rgb)
    (0 until 4).foreach { y =>
      (0 until 8).foreach { x =>
        rgb((y * 8 + x) * 3) = (x * 10 + y).toByte // red only
      }
    }
    val grid = Ppm.resizeLuminance(img, 4)
    (0 until 4).foreach { gy =>
      (0 until 4).foreach { gx =>
        val expected = 299 * (2 * gx * 10 + gy) / 1000
        assert(grid(gy * 4 + gx) == expected, s"($gx,$gy)")
      }
    }
  }

  test("frame sequence: stride sampling decodes ONLY the kept frames") {
    import graft.media.FrameSeq
    def frame(v: Int): Array[Byte] =
      Ppm.encode(Ppm.Image(2, 2, Array.fill(12)(v.toByte)))
    val corrupt = "NOT A PPM FRAME".getBytes("US-ASCII")
    // frames 0,2 valid; frame 1 corrupt — stride 2 must never touch it
    val seq = FrameSeq.encode(Seq(frame(10), corrupt, frame(30)))
    assert(FrameSeq.frameCount(seq) == 3)
    val kept = FrameSeq.sample(seq, stride = 2)
    assert(kept.size == 2 && kept.forall(_.width == 2))
    assert(kept.head.rgb(0) == 10.toByte && kept(1).rgb(0) == 30.toByte)
    // stride 1 DOES decode the corrupt frame and must fail loudly
    assert(intercept[IllegalArgumentException](
      FrameSeq.sample(seq, stride = 1)).getMessage.contains("P6"))
    // truncated container rejects
    assert(intercept[IllegalArgumentException](
      FrameSeq.sample(seq.dropRight(3), stride = 2)).getMessage.nonEmpty)
    // mean luminance of a uniform frame: channel v everywhere ->
    // (299v + 587v + 114v)/1000 == v
    assert(Ppm.meanLuminance(kept.head) == 10)
  }

  test("q71/q72 pipelines: decoded output matches the synthesis formulas") {
    val sf = "/root/testdata/sf0.001"
    val wav = MultimodalOps.qWavFeatures(spark, sf).collect()
    assert(wav.length == 500)
    val r0 = wav.head
    // doc 0: k=37, n = 256 + n_chars%512; spot-check against the formula
    assert(r0.getAs[Long]("n_samples") >= 256L &&
      r0.getAs[Long]("n_samples") < 768L)
    assert(r0.getAs[Long]("peak") <= 32768L)
    val ppm = MultimodalOps.qPpmGrid(spark, sf).collect()
    assert(ppm.length == 500)
    assert(ppm.forall(_.getAs[String]("grid").split(',').length == 16))
    assert(ppm.forall(r => r.getAs[Long]("width") == 16 + r.getAs[Long]("doc_id") % 17))
  }
}

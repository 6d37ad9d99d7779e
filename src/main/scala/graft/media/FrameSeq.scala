package graft.media

import java.nio.ByteBuffer

/** A length-prefixed sequence of P6 PPM frames — the uncompressed
  * "video" container for the frame-sampling pipeline (compressed video
  * codecs are the documented seam; the CONTAINER walk, per-frame
  * decode, and stride sampling are the real operations a production
  * frame-sampler performs on top of whatever codec decodes a frame).
  *
  * Layout: 4-byte magic "GFV1", 4-byte frame count, then per frame a
  * 4-byte big-endian byte length followed by a complete P6 blob. */
object FrameSeq {
  val Magic: Array[Byte] = "GFV1".getBytes("US-ASCII")

  def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(4 + _.length).sum
    val bb = ByteBuffer.allocate(total)
    bb.put(Magic).putInt(frames.size)
    frames.foreach { f => bb.putInt(f.length).put(f) }
    bb.array()
  }

  /** Decode frame HEADERS eagerly but pixel data lazily per frame:
    * `sample` only P6-decodes the frames the stride selects — the point
    * of frame sampling is precisely not to decode what you skip. */
  def frameCount(bytes: Array[Byte]): Int = {
    require(bytes.length >= 8 &&
      java.util.Arrays.equals(bytes.take(4), Magic), "not a GFV1 sequence")
    val n = ByteBuffer.wrap(bytes, 4, 4).getInt
    require(n >= 0, s"negative frame count $n")
    n
  }

  /** Every `stride`-th frame (0, stride, 2*stride, ...), decoded. */
  def sample(bytes: Array[Byte], stride: Int): Seq[Ppm.Image] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val n = frameCount(bytes)
    val bb = ByteBuffer.wrap(bytes)
    bb.position(8)
    (0 until n).flatMap { i =>
      require(bb.remaining() >= 4, s"truncated frame header $i")
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining(), s"truncated frame $i")
      if (i % stride == 0) {
        val blob = new Array[Byte](len)
        bb.get(blob)
        Some(Ppm.decode(blob))
      } else {
        bb.position(bb.position() + len) // skip without decoding
        None
      }
    }
  }
}

package graft

import graft.index.Codec
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable
import scala.util.Random

/** r8 optimization pin: the histogram/word-wise PFOR packer and the
  * word-wise unpacker must be BYTE-IDENTICAL to the original per-bit
  * reference implementation — the stored index layout (and the byte
  * metrics derived from it) may not move. Fixed-seed property loops,
  * CodecSpec style. */
class CodecPackSpec extends AnyFunSuite {

  /** The pre-r8 reference packer, verbatim. */
  private def refPack(buf: mutable.ArrayBuilder[Byte], vs: Array[Long]): Unit = {
    def bitsOf(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v | 1L)
    val n = vs.length
    Codec.writeVarLong(buf, n.toLong)
    if (n == 0) return
    val bits = vs.map(bitsOf)
    var bestW = 64
    var bestCost = Long.MaxValue
    var w = 0
    while (w <= 64) {
      var excBytes = 0L
      var i = 0
      while (i < n) {
        if (bits(i) > w) excBytes += 2 + (bits(i) + 6) / 7
        i += 1
      }
      val cost = (n.toLong * w + 7) / 8 + excBytes
      if (cost < bestCost) { bestCost = cost; bestW = w }
      w += 1
    }
    val width = bestW
    buf += width.toByte
    val mask = if (width == 64) -1L else (1L << width) - 1
    var nExc = 0
    var i = 0
    while (i < n) { if (bits(i) > width) nExc += 1; i += 1 }
    Codec.writeVarLong(buf, nExc.toLong)
    val packedLen = ((n.toLong * width + 7) / 8).toInt
    val packed = new Array[Byte](packedLen)
    var bitPos = 0L
    i = 0
    while (i < n) {
      val v = vs(i) & mask
      var b = 0
      while (b < width) {
        if (((v >>> b) & 1L) != 0L) {
          val p = bitPos + b
          packed((p >>> 3).toInt) = (packed((p >>> 3).toInt) | (1 << (p & 7)).toByte).toByte
        }
        b += 1
      }
      bitPos += width
      i += 1
    }
    packed.foreach(buf += _)
    i = 0
    while (i < n) {
      if (bits(i) > width) {
        Codec.writeVarLong(buf, i.toLong); Codec.writeVarLong(buf, vs(i))
      }
      i += 1
    }
  }

  private val packM = {
    val m = Codec.getClass.getDeclaredMethods.find(_.getName == "packArray").get
    m.setAccessible(true); m
  }
  private val unpackM = {
    val m = Codec.getClass.getDeclaredMethods.find(_.getName == "unpackArray").get
    m.setAccessible(true); m
  }

  private def newPack(vs: Array[Long]): Array[Byte] = {
    val b = mutable.ArrayBuilder.make[Byte]
    packM.invoke(Codec, b, vs)
    b.result()
  }

  private def refBytes(vs: Array[Long]): Array[Byte] = {
    val b = mutable.ArrayBuilder.make[Byte]
    refPack(b, vs)
    b.result()
  }

  private def checkIdentical(arr: Array[Long]): Unit = {
    val nb = newPack(arr)
    val rb = refBytes(arr)
    assert(java.util.Arrays.equals(nb, rb),
      s"pack bytes diverge for len=${arr.length} head=${arr.take(5).mkString(",")}")
    // and the unpacker reads its own bytes back exactly
    val r = new Codec.Reader(nb)
    val back = unpackM.invoke(Codec, r, nb).asInstanceOf[Array[Long]]
    assert(back.toSeq == arr.toSeq, "unpack(pack(x)) != x")
    assert(r.pos == nb.length, "unpack did not consume the full stream")
  }

  test("new packArray byte-identical to reference on random arrays") {
    val rnd = new Random(20260822L)
    (1 to 300).foreach { _ =>
      val n = rnd.nextInt(301)
      val arr = Array.fill(n) {
        rnd.nextInt(12) match {
          case 0 => rnd.nextLong() >>> 1          // wide outlier
          case 1 => 0L
          case 2 => Long.MaxValue
          case k if k < 8 => rnd.nextLong(128L)   // typical small
          case _ => rnd.nextLong(100000L)
        }
      }
      checkIdentical(arr)
    }
  }

  test("new packArray byte-identical on edge shapes") {
    Seq(
      Array.empty[Long],
      Array(0L), Array(Long.MaxValue),
      Array.fill(128)(0L),
      Array.fill(128)(Long.MaxValue),
      Array.tabulate(128)(_.toLong),
      Array.tabulate(128)(i => if (i % 7 == 0) Long.MaxValue else i.toLong),
      Array.tabulate(57)(i => (1L << 56) + i),   // width near the word-wise limit
      Array.tabulate(130)(i => (1L << 60) + i)   // width > 57: per-bit fallback
    ).foreach(checkIdentical)
  }
}

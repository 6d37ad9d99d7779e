package graft

import graft.index.Codec
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** FIXTURES.md §5: ∀ sorted distinct docID lists, decode∘encode == id;
  * block-boundary sizes; varint edge values. Property loops use a fixed
  * seed (deterministic re-runs). */
class CodecSpec extends AnyFunSuite {

  private def randomList(rnd: Random): (Array[Long], Array[Int], Array[Int]) = {
    val n = rnd.nextInt(5001)
    var doc = 0L
    val docs = Array.fill(n) { doc += 1 + rnd.nextLong(1L << 32); doc }
    val tfs = Array.fill(n)(1 + rnd.nextInt(1 << 15))
    val dls = Array.fill(n)(1 + rnd.nextInt(1 << 20))
    (docs, tfs, dls)
  }

  test("roundtrip property: decode(encode(xs)) == xs (200 random lists, both formats)") {
    val rnd = new Random(42)
    (1 to 200).foreach { i =>
      val (docs, tfs, dls) = randomList(rnd)
      val fmt = if (i % 2 == 0) Codec.Varint else Codec.Pfor
      val enc = Codec.encode(docs, tfs, dls, format = fmt)
      val (d2, t2, l2) = Codec.decodeAll(enc)
      assert(d2.toSeq === docs.toSeq)
      assert(t2.toSeq === tfs.toSeq)
      assert(l2.toSeq === dls.toSeq)
      assert(enc.count === docs.length.toLong)
    }
  }

  test("positions roundtrip: random per-posting ascending lists, incl. empties") {
    val rnd = new scala.util.Random(31)
    (1 to 100).foreach { round =>
      val n = rnd.nextInt(40)
      val positions: Array[Array[Int]] = Array.fill(n) {
        val m = rnd.nextInt(12) // 0 = a tf-0 shape never produced, but safe
        var cur = rnd.nextInt(5)
        Array.fill(math.max(1, m)) { val v = cur; cur += 1 + rnd.nextInt(7); v }
      }
      val tfs = positions.map(_.length)
      val enc = Codec.encodePositions(positions)
      val dec = Codec.decodePositions(enc, tfs)
      assert(dec.length === positions.length, s"round $round")
      dec.zip(positions).foreach { case (a, b) =>
        assert(a.toSeq === b.toSeq, s"round $round")
      }
    }
    // truncation/corruption is loud: surplus bytes rejected
    val enc = Codec.encodePositions(Array(Array(1, 3), Array(2)))
    intercept[IllegalArgumentException] {
      Codec.decodePositions(enc, Array(2)) // one posting's tf missing
    }
    // non-ascending positions rejected at encode
    intercept[IllegalArgumentException] {
      Codec.encodePositions(Array(Array(5, 5)))
    }
  }

  test("position streams concatenate: per-posting encodes == group encode") {
    // the build path ships each posting's stream pre-encoded and block
    // streams are plain concatenation — must be byte-identical to
    // encoding the whole group at once
    val rnd = new scala.util.Random(53)
    (1 to 30).foreach { _ =>
      val group: Array[Array[Int]] = Array.fill(1 + rnd.nextInt(20)) {
        var cur = rnd.nextInt(4)
        Array.fill(1 + rnd.nextInt(9)) { val v = cur; cur += 1 + rnd.nextInt(5); v }
      }
      val whole = Codec.encodePositions(group)
      val concat = group.flatMap(ps => Codec.encodePositions(Array(ps)))
      assert(whole.toSeq === concat.toSeq)
    }
  }

  test("PFOR with skewed values (exception patching) roundtrips and is smaller") {
    val rnd = new Random(99)
    // mostly-small deltas with rare huge outliers — PFOR's target shape
    var doc = 0L
    val docs = Array.fill(2000) {
      doc += (if (rnd.nextInt(100) == 0) 1L << 40 else 1 + rnd.nextInt(30).toLong)
      doc
    }
    val tfs = Array.fill(2000)(if (rnd.nextInt(50) == 0) 30000 else 1 + rnd.nextInt(4))
    val dls = Array.fill(2000)(100 + rnd.nextInt(50))
    val pf = Codec.encode(docs, tfs, dls, format = Codec.Pfor)
    val vi = Codec.encode(docs, tfs, dls, format = Codec.Varint)
    val (d2, t2, l2) = Codec.decodeAll(pf)
    assert(d2.toSeq === docs.toSeq && t2.toSeq === tfs.toSeq && l2.toSeq === dls.toSeq)
    val pfBytes = pf.blocks.map(_.length).sum
    val viBytes = vi.blocks.map(_.length).sum
    assert(pfBytes < viBytes, s"pfor $pfBytes vs varint $viBytes")
  }

  test("mixed-format lists decode seamlessly (old varint segments + new pfor)") {
    val docs = Array.tabulate(300)(i => i.toLong * 3 + 1)
    val tfs = Array.tabulate(300)(i => (i % 7) + 1)
    val dls = Array.tabulate(300)(_ => 42)
    val a = Codec.encode(docs.take(150), tfs.take(150), dls.take(150), format = Codec.Varint)
    val b = Codec.encode(docs.drop(150), tfs.drop(150), dls.drop(150), format = Codec.Pfor)
    val merged = graft.index.EncodedPostings(a.blocks ++ b.blocks, a.skips ++ b.skips, 300L)
    val (d2, t2, l2) = Codec.decodeAll(merged)
    assert(d2.toSeq === docs.toSeq && t2.toSeq === tfs.toSeq && l2.toSeq === dls.toSeq)
  }

  test("block boundary sizes and skip metadata") {
    for (n <- Seq(1, 127, 128, 129, 256, 257)) {
      val docs = Array.tabulate(n)(i => (i * 7 + 3).toLong)
      val tfs = Array.tabulate(n)(i => (i % 13) + 1)
      val dls = Array.tabulate(n)(i => (i % 50) + 10)
      val enc = Codec.encode(docs, tfs, dls)
      assert(enc.blocks.length === (n + 127) / 128)
      enc.skips.zipWithIndex.foreach { case (s, b) =>
        val lo = b * 128
        val hi = math.min(lo + 128, n)
        assert(s.firstDoc === docs(lo))
        assert(s.lastDoc === docs(hi - 1))
        assert(s.maxTf === (lo until hi).map(tfs).max)
        assert(s.minDl === (lo until hi).map(dls).min)
      }
      val (d2, t2, l2) = Codec.decodeAll(enc)
      assert(d2.toSeq === docs.toSeq && t2.toSeq === tfs.toSeq && l2.toSeq === dls.toSeq)
    }
  }

  test("varint edge values") {
    import scala.collection.mutable
    for (v <- Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Long.MaxValue)) {
      val buf = mutable.ArrayBuilder.make[Byte]
      Codec.writeVarLong(buf, v)
      val r = new Codec.Reader(buf.result())
      assert(r.readVarLong() === v)
    }
  }

  test("huge gaps (sparse 64-bit docIds, e.g. shard-prefixed)") {
    val docs = Array(0L, 1L << 40, (1L << 40) + 1, 3L << 40, Long.MaxValue - 1)
    val tfs = Array(1, 2, 3, 4, 5)
    val dls = Array(10, 20, 30, 40, 50)
    val (d2, t2, l2) = Codec.decodeAll(Codec.encode(docs, tfs, dls))
    assert(d2.toSeq === docs.toSeq && t2.toSeq === tfs.toSeq && l2.toSeq === dls.toSeq)
  }
}

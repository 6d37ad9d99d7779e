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

  test("roundtrip property: decode(encode(xs)) == xs (200 random lists)") {
    val rnd = new Random(42)
    (1 to 200).foreach { _ =>
      val (docs, tfs, dls) = randomList(rnd)
      val enc = Codec.encode(docs, tfs, dls)
      val (d2, t2, l2) = Codec.decodeAll(enc)
      assert(d2.toSeq === docs.toSeq)
      assert(t2.toSeq === tfs.toSeq)
      assert(l2.toSeq === dls.toSeq)
      assert(enc.count === docs.length.toLong)
    }
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

package graft.index

import scala.collection.mutable

/** One skip entry per 128-posting block: enough metadata to (a) skip the
  * block during conjunctive advance (firstDoc/lastDoc) and (b) compute a
  * safe BM25 upper bound for block-max WAND (maxTf monotone-up, minDl
  * monotone-down in the score). Mirrors what Lucene keeps in its skip data
  * plus the BMW max-score metadata (Ding & Suel, WSDM 2011 — public). */
final case class Skip(firstDoc: Long, lastDoc: Long, maxTf: Int, minDl: Int)

/** An encoded posting list (or sub-list, when document-sharded):
  * delta+varint compressed 128-entry blocks with per-block skip entries. */
final case class EncodedPostings(blocks: Array[Array[Byte]], skips: Array[Skip], count: Long)

/**
 * Postings codec: per block of up to 128 postings
 *   varint(n)
 *   n-1 docId deltas, varint   (first docId lives in the skip entry)
 *   n   tf values, varint
 *   n   docLen values, varint  (dl stored inline => posting lists are
 *                               self-contained, no norms join at query time;
 *                               Lucene's equivalent is the per-doc norm)
 *
 * Property-tested in CodecSpec: decode(encode(xs)) == xs for arbitrary
 * sorted distinct docId lists incl. block-boundary sizes and varint edge
 * values. PForDelta-style exception patching is a planned v2 — the block
 * layout (fixed 128) is already FOR-compatible.
 */
object Codec {
  val BlockSize = 128

  def writeVarLong(buf: mutable.ArrayBuilder[Byte], v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      buf += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    buf += v.toByte
  }

  /** Reads a varint starting at pos(0); returns value, advances pos. */
  final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def readVarLong(): Long = {
      var b = bytes(pos); pos += 1
      var v = (b & 0x7fL)
      var shift = 7
      while ((b & 0x80) != 0) {
        b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      }
      v
    }
    def hasMore: Boolean = pos < bytes.length
  }

  /** docIds must be sorted strictly ascending; tfs/dls parallel arrays. */
  def encode(docIds: Array[Long], tfs: Array[Int], dls: Array[Int],
             blockSize: Int = BlockSize): EncodedPostings = {
    require(docIds.length == tfs.length && tfs.length == dls.length)
    val nBlocks = (docIds.length + blockSize - 1) / blockSize
    val blocks = new Array[Array[Byte]](nBlocks)
    val skips = new Array[Skip](nBlocks)
    var b = 0
    while (b < nBlocks) {
      val start = b * blockSize
      val end = math.min(start + blockSize, docIds.length)
      val n = end - start
      val buf = mutable.ArrayBuilder.make[Byte]
      writeVarLong(buf, n.toLong)
      var i = start + 1
      while (i < end) { writeVarLong(buf, docIds(i) - docIds(i - 1)); i += 1 }
      i = start
      var maxTf = 0
      while (i < end) { writeVarLong(buf, tfs(i).toLong); if (tfs(i) > maxTf) maxTf = tfs(i); i += 1 }
      i = start
      var minDl = Int.MaxValue
      while (i < end) { writeVarLong(buf, dls(i).toLong); if (dls(i) < minDl) minDl = dls(i); i += 1 }
      blocks(b) = buf.result()
      skips(b) = Skip(docIds(start), docIds(end - 1), maxTf, if (n == 0) 0 else minDl)
      b += 1
    }
    EncodedPostings(blocks, skips, docIds.length.toLong)
  }

  /** Decodes one block. firstDoc comes from the matching skip entry. */
  def decodeBlock(bytes: Array[Byte], firstDoc: Long): (Array[Long], Array[Int], Array[Int]) = {
    val r = new Reader(bytes)
    val n = r.readVarLong().toInt
    val docs = new Array[Long](n)
    val tfs = new Array[Int](n)
    val dls = new Array[Int](n)
    if (n > 0) {
      docs(0) = firstDoc
      var i = 1
      while (i < n) { docs(i) = docs(i - 1) + r.readVarLong(); i += 1 }
      i = 0
      while (i < n) { tfs(i) = r.readVarLong().toInt; i += 1 }
      i = 0
      while (i < n) { dls(i) = r.readVarLong().toInt; i += 1 }
    }
    (docs, tfs, dls)
  }

  def decodeAll(p: EncodedPostings): (Array[Long], Array[Int], Array[Int]) = {
    val docs = mutable.ArrayBuilder.make[Long]
    val tfs = mutable.ArrayBuilder.make[Int]
    val dls = mutable.ArrayBuilder.make[Int]
    var b = 0
    while (b < p.blocks.length) {
      val (d, t, l) = decodeBlock(p.blocks(b), p.skips(b).firstDoc)
      docs ++= d; tfs ++= t; dls ++= l
      b += 1
    }
    (docs.result(), tfs.result(), dls.result())
  }
}

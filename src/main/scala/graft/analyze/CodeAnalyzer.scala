package graft.analyze

import scala.collection.mutable

/**
 * Code-aware analyzer: the engine's equivalent of both the reference's NLP
 * tokenization stage (tokenize -> lowercase -> strip punct -> stopwords ->
 * min length; /root/reference/sentiment.py:132-145) and the Elasticsearch
 * `english` analyzer the reference provisions on its analyzed text fields
 * (/root/reference/sentiment.py:782-793).
 *
 * Frozen semantics (spec-tested in AnalyzerSpec — do not change without
 * re-freezing golden cases, index layouts depend on it):
 *
 *  1. Raw words = maximal runs of [A-Za-z0-9_].
 *  2. Each raw word is sub-split at: '_' boundaries, lower->Upper camelCase
 *     transitions, acronym ends (HTTPServer -> HTTP|Server), and
 *     letter<->digit transitions (foo2Bar -> foo|2|Bar).
 *  3. All emitted tokens are lowercased.
 *  4. If a word produced more than one sub-part, the full lowercased raw
 *     word (underscores kept) is ALSO emitted after its parts — Lucene
 *     WordDelimiterFilter's preserveOriginal behavior, so exact-identifier
 *     queries still match.
 *  5. Filters, applied to every candidate token: length >= 2, not a pure
 *     digit run, not in the english stopword set (Lucene's default english
 *     stop set — public knowledge).
 *  6. docLen (BM25 `dl`) = number of tokens emitted after filtering.
 *
 * Pure function of the input string: safe to call from executors, codegen
 * friendly via wrapping in a UDF/Expression if ever needed.
 */
object CodeAnalyzer extends Serializable {

  /** Lucene EnglishAnalyzer default stop set (public). */
  val Stopwords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  val MinTokenLen = 2

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
    (c >= '0' && c <= '9') || c == '_'

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isUpper(c: Char): Boolean = c >= 'A' && c <= 'Z'
  @inline private def isLower(c: Char): Boolean = c >= 'a' && c <= 'z'

  /** Sub-split one raw word (camelCase / snake_case / digit boundaries).
    * Returns NON-lowercased parts, '_' removed. */
  def splitWord(w: String): Seq[String] = {
    val parts = mutable.ArrayBuffer.empty[String]
    val n = w.length
    var start = 0
    var i = 0
    @inline def cut(end: Int, nextStart: Int): Unit = {
      if (end > start) parts += w.substring(start, end)
      start = nextStart
    }
    while (i < n) {
      val c = w.charAt(i)
      if (c == '_') { cut(i, i + 1) }
      else if (i > start) {
        val p = w.charAt(i - 1)
        if (isLower(p) && isUpper(c)) cut(i, i)                       // fooBar
        else if (isUpper(p) && isUpper(c) && i + 1 < n && isLower(w.charAt(i + 1)))
          cut(i, i)                                                   // HTTPServer
        else if (isDigit(p) != isDigit(c) && isWordChar(p) && p != '_')
          cut(i, i)                                                   // foo2Bar
      }
      i += 1
    }
    cut(n, n)
    parts.toSeq
  }

  @inline private def keep(t: String): Boolean = {
    if (t.length < MinTokenLen) return false
    var i = 0
    var allDigit = true
    while (i < t.length && allDigit) { if (!isDigit(t.charAt(i))) allDigit = false; i += 1 }
    if (allDigit) return false
    !Stopwords.contains(t)
  }

  /** ASCII-exact lowercased slice [a, b) of `s`. Raw words contain only
    * [A-Za-z0-9_] (isWordChar), so this equals substring+toLowerCase
    * without the double copy (r8 hot-loop form). */
  @inline private def lowerSub(s: String, a: Int, b: Int): String = {
    val len = b - a
    val out = new Array[Char](len)
    var i = 0
    while (i < len) {
      val c = s.charAt(a + i)
      out(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      i += 1
    }
    new String(out)
  }

  @inline private def lowerAt(s: String, i: Int): Char = {
    val c = s.charAt(i)
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  }

  /** Consumer of token SPANS: the token value is the ASCII-lowercased
    * [a, b) slice of `src`. The zero-alloc core under foreachToken —
    * a sink that needs the String materializes it; the build-path map
    * only does so once per DISTINCT term (r8). `hash` is the JDK
    * String.hashCode of the lowered span, computed once in the emitter's
    * filter walk and passed through so sinks never re-scan the span. */
  trait SpanSink { def span(src: String, a: Int, b: Int, hash: Int): Unit }

  @inline private[analyze] def spanEquals(key: String, s: String, a: Int, b: Int): Boolean = {
    if (key.length != b - a) return false
    var i = 0
    while (i < key.length) {
      if (key.charAt(i) != lowerAt(s, a + i)) return false
      i += 1
    }
    true
  }

  /** Stopword set as an open-addressed probe table for span lookups. */
  private val StopMask = 127
  private val StopTable: Array[String] = {
    val t = new Array[String](StopMask + 1)
    Stopwords.foreach { w =>
      var i = w.hashCode & StopMask
      while (t(i) != null) i = (i + 1) & StopMask
      t(i) = w
    }
    t
  }

  /** keep() on a span, fused with the hash (r8): ONE walk computes the
    * lowered-span String.hashCode and the pure-digit flag together; the
    * stopword probe and every downstream sink reuse that hash (the old
    * shape walked the span once for the digit check, once for the
    * stopword-probe hash, and a third time in the sink's map probe).
    * Returns -1L when the token is filtered (length < 2, pure digit run,
    * stopword), else the hash zero-extended into [0, 2^32) — the two
    * ranges cannot collide. */
  private def keepSpanHash(s: String, a: Int, b: Int): Long = {
    if (b - a < MinTokenLen) return -1L
    var i = a
    var allDigit = true
    var h = 0
    while (i < b) {
      val c = lowerAt(s, i)
      if (c < '0' || c > '9') allDigit = false
      h = h * 31 + c
      i += 1
    }
    if (allDigit) return -1L
    var j = h & StopMask
    while (StopTable(j) != null) {
      if (spanEquals(StopTable(j), s, a, b)) return -1L
      j = (j + 1) & StopMask
    }
    h.toLong & 0xffffffffL
  }

  /** Emit one raw word's post-filter token spans (splitWord boundaries
    * walked in place — no per-word buffers or substrings). */
  private def emitWord(w: String, ws: Int, we: Int, f: SpanSink): Unit = {
    var parts = 0
    var start = ws
    var i = ws
    @inline def cut(end: Int, nextStart: Int): Unit = {
      if (end > start) {
        parts += 1
        val h = keepSpanHash(w, start, end)
        if (h != -1L) f.span(w, start, end, h.toInt)
      }
      start = nextStart
    }
    while (i < we) {
      val c = w.charAt(i)
      if (c == '_') { cut(i, i + 1) }
      else if (i > start) {
        val p = w.charAt(i - 1)
        if (isLower(p) && isUpper(c)) cut(i, i)                       // fooBar
        else if (isUpper(p) && isUpper(c) && i + 1 < we && isLower(w.charAt(i + 1)))
          cut(i, i)                                                   // HTTPServer
        else if (isDigit(p) != isDigit(c) && isWordChar(p) && p != '_')
          cut(i, i)                                                   // foo2Bar
      }
      i += 1
    }
    cut(we, we)
    if (parts > 1) { // underscores kept (preserveOriginal)
      val h = keepSpanHash(w, ws, we)
      if (h != -1L) f.span(w, ws, we, h.toInt)
    }
  }

  /** Visit every emitted token SPAN of [[analyze]] in document order —
    * the allocation-free core every analysis entry point shares (r8;
    * emission semantics unchanged and pinned by AnalyzerSpec goldens). */
  def foreachSpan(content: String)(f: SpanSink): Unit = {
    if (content == null || content.isEmpty) return
    val n = content.length
    var i = 0
    while (i < n) {
      while (i < n && !isWordChar(content.charAt(i))) i += 1
      val start = i
      while (i < n && isWordChar(content.charAt(i))) i += 1
      if (i > start) emitWord(content, start, i, f)
    }
  }

  /** Visit every emitted token of [[analyze]] in document order without
    * materializing the token sequence. */
  def foreachToken(content: String)(f: String => Unit): Unit =
    foreachSpan(content)(new SpanSink {
      def span(src: String, a: Int, b: Int, hash: Int): Unit =
        f(lowerSub(src, a, b))
    })

  /** Full analysis: token stream in document order (post-filter). */
  def analyze(content: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    foreachToken(content)(out += _)
    out.toSeq
  }

  /** (term -> tf) map plus docLen, single pass. */
  def termFreqs(content: String): (Map[String, Int], Int) = {
    val m = mutable.HashMap.empty[String, Int]
    var n = 0
    foreachToken(content) { t =>
      m.update(t, m.getOrElse(t, 0) + 1)
      n += 1
    }
    (m.toMap, n)
  }

  /** (term -> ascending token positions) plus docLen, single pass.
    * Positions index the POST-FILTER emission sequence of [[analyze]]
    * (stopword removal closes gaps — "merge the join" puts merge/join
    * at consecutive positions; frozen phrase-match semantics, and what
    * the DuckDB oracle's filtered-token window checks reproduce).
    * tf == positions.length by construction. */
  def termPositions(content: String): (Map[String, Array[Int]], Int) = {
    val m = mutable.HashMap.empty[String, mutable.ArrayBuilder.ofInt]
    var i = 0
    foreachToken(content) { t =>
      m.getOrElseUpdate(t, new mutable.ArrayBuilder.ofInt) += i
      i += 1
    }
    (m.view.mapValues(_.result()).toMap, i)
  }

  /** Growable int buffer whose result() ALWAYS copies (unlike
    * ArrayBuilder.ofInt, whose result() aliases its internal array when
    * size == capacity) — safe to pool and reuse across documents. */
  private final class IntBuf {
    private var a = new Array[Int](8)
    var n = 0
    def add(x: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
      a(n) = x
      n += 1
    }
    def result(): Array[Int] = java.util.Arrays.copyOf(a, n)
    def reset(): Unit = n = 0
  }

  /** Intern-table pointer-array cap: past ~1M distinct terms a partition
    * stops interning and falls back to plain per-doc allocation — the
    * table's memory stays bounded while every realistic per-shard
    * vocabulary (bench: ~10^4) is fully covered. */
  private val InternCap = 1 << 20

  /** Reusable build-path analyzer session (r8): ONE instance per build
    * task, fed every document of the partition. Two layers:
    *
    *  - a partition-level term INTERN table (open-addressed on the span
    *    hash): the token String for a distinct term is allocated once
    *    per PARTITION, not once per document — a shard's documents
    *    repeat their vocabulary almost entirely, so the per-doc String
    *    churn (~hundreds of allocations/doc) collapses to ~zero.
    *  - a generation-stamped per-doc (term -> positions) map probed by
    *    the same hash (khash prefilter, then reference-or-equals key
    *    compare); bumping the generation IS the per-doc clear.
    *
    * Positions accumulate in pooled [[IntBuf]]s (handed out per doc,
    * reclaimed wholesale at emission; result() copies, so emitted arrays
    * never alias the pool). Not thread-safe — one session per task. */
  final class AnalyzerSession extends SpanSink {
    // per-doc map
    private var cap = 256
    private var keys = new Array[String](cap)
    private var khash = new Array[Int](cap)
    private var vals = new Array[IntBuf](cap)
    private var stamp = new Array[Int](cap)
    private var gen = 0
    private var size = 0
    private var nextPos = 0
    // partition-level intern table
    private var icap = 1024
    private var ikeys = new Array[String](icap)
    private var ihash = new Array[Int](icap)
    private var isize = 0
    // IntBuf pool (all buffers in live slots; reclaimed per doc)
    private val pool = mutable.ArrayBuffer.empty[IntBuf]
    private var used = 0

    private def nextBuf(): IntBuf = {
      if (used == pool.length) pool += new IntBuf
      val b = pool(used)
      used += 1
      b.reset()
      b
    }

    private def intern(src: String, a: Int, b: Int, h: Int): String = {
      val mask = icap - 1
      var j = h & mask
      while (ikeys(j) != null) {
        if (ihash(j) == h && spanEquals(ikeys(j), src, a, b)) return ikeys(j)
        j = (j + 1) & mask
      }
      val s = lowerSub(src, a, b)
      if (isize < InternCap) {
        ikeys(j) = s
        ihash(j) = h
        isize += 1
        if ((isize << 1) >= icap) growIntern()
      }
      s
    }

    private def growIntern(): Unit = {
      val ok = ikeys
      val oh = ihash
      icap <<= 1
      ikeys = new Array[String](icap)
      ihash = new Array[Int](icap)
      val mask = icap - 1
      var i = 0
      while (i < ok.length) {
        if (ok(i) != null) {
          var j = oh(i) & mask
          while (ikeys(j) != null) j = (j + 1) & mask
          ikeys(j) = ok(i)
          ihash(j) = oh(i)
        }
        i += 1
      }
    }

    private def grow(): Unit = {
      val ok = keys
      val oh = khash
      val ov = vals
      val os = stamp
      cap <<= 1
      keys = new Array[String](cap)
      khash = new Array[Int](cap)
      vals = new Array[IntBuf](cap)
      stamp = new Array[Int](cap)
      val mask = cap - 1
      var i = 0
      while (i < ok.length) {
        if (os(i) == gen && ok(i) != null) {
          var j = oh(i) & mask
          while (stamp(j) == gen) j = (j + 1) & mask
          keys(j) = ok(i)
          khash(j) = oh(i)
          vals(j) = ov(i)
          stamp(j) = gen
        }
        i += 1
      }
    }

    def span(src: String, a: Int, b: Int, h: Int): Unit = {
      if (((size + 1) << 1) >= cap) grow()
      val mask = cap - 1
      var i = h & mask
      while (stamp(i) == gen &&
             !(khash(i) == h && spanEquals(keys(i), src, a, b)))
        i = (i + 1) & mask
      if (stamp(i) != gen) {
        keys(i) = intern(src, a, b, h)
        khash(i) = h
        vals(i) = nextBuf()
        stamp(i) = gen
        size += 1
      }
      vals(i).add(nextPos)
      nextPos += 1
    }

    /** (term, positions) pairs sorted by term (String.compareTo) plus
      * docLen for ONE document; resets the per-doc state afterwards.
      * Output identical to the stateless [[CodeAnalyzer.termPositionsSorted]]. */
    def termPositionsSorted(content: String): (Array[(String, Array[Int])], Int) = {
      // begin doc: generation bump IS the clear
      if (gen == Int.MaxValue) { java.util.Arrays.fill(stamp, 0); gen = 0 }
      gen += 1
      size = 0
      nextPos = 0
      used = 0
      foreachSpan(content)(this)
      val ks = new Array[String](size)
      var i = 0
      var k = 0
      while (i < cap) {
        if (stamp(i) == gen) { ks(k) = keys(i); k += 1 }
        i += 1
      }
      java.util.Arrays.sort(ks.asInstanceOf[Array[AnyRef]])
      val out = new Array[(String, Array[Int])](size)
      val mask = cap - 1
      k = 0
      while (k < size) {
        var j = ks(k).hashCode & mask
        while (!(stamp(j) == gen &&
                 ((keys(j) eq ks(k)) || keys(j).equals(ks(k)))))
          j = (j + 1) & mask
        out(k) = (ks(k), vals(j).result())
        k += 1
      }
      (out, nextPos)
    }
  }

  /** Build-path fusion (r8): term-sorted (term, positions) pairs plus
    * docLen in ONE span-keyed pass — one String allocation per distinct
    * term, no per-occurrence token objects. Term order is
    * String.compareTo, identical to the original sortBy(_._1).
    * Stateless convenience over a fresh [[AnalyzerSession]]; the build
    * path holds one session per task so term Strings intern across the
    * partition's documents. */
  def termPositionsSorted(content: String): (Array[(String, Array[Int])], Int) =
    new AnalyzerSession().termPositionsSorted(content)

  /** Query analysis: distinct terms, first-occurrence order (frozen —
    * BM25 sums contributions in this order; oracle matches). */
  def analyzeQuery(q: String): Seq[String] = analyze(q).distinct
}

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

  /** Full analysis: token stream in document order (post-filter). */
  def analyze(content: String): Seq[String] = {
    if (content == null || content.isEmpty) return Nil
    val out = mutable.ArrayBuffer.empty[String]
    val n = content.length
    var i = 0
    while (i < n) {
      while (i < n && !isWordChar(content.charAt(i))) i += 1
      val start = i
      while (i < n && isWordChar(content.charAt(i))) i += 1
      if (i > start) {
        val raw = content.substring(start, i)
        val parts = splitWord(raw)
        var emitted = 0
        parts.foreach { p =>
          val t = p.toLowerCase
          if (keep(t)) { out += t; emitted += 1 }
        }
        if (parts.length > 1) {
          val orig = raw.toLowerCase
          if (keep(orig)) out += orig
        }
      }
    }
    out.toSeq
  }

  /** (term -> tf) map plus docLen, single pass. */
  def termFreqs(content: String): (Map[String, Int], Int) = {
    val toks = analyze(content)
    val m = mutable.HashMap.empty[String, Int]
    toks.foreach(t => m.update(t, m.getOrElse(t, 0) + 1))
    (m.toMap, toks.length)
  }

  /** (term -> ascending token positions) plus docLen, single pass.
    * Positions index the POST-FILTER emission sequence of [[analyze]]
    * (stopword removal closes gaps — "merge the join" puts merge/join
    * at consecutive positions; frozen phrase-match semantics, and what
    * the DuckDB oracle's filtered-token window checks reproduce).
    * tf == positions.length by construction. */
  def termPositions(content: String): (Map[String, Array[Int]], Int) = {
    val toks = analyze(content)
    val m = mutable.HashMap.empty[String, mutable.ArrayBuilder.ofInt]
    // single linear traversal — analyze() returns a List-backed Seq, so
    // positional indexing here would be quadratic per document (found
    // the hard way: it serialized the bench's build phase)
    var i = 0
    toks.foreach { t =>
      m.getOrElseUpdate(t, new mutable.ArrayBuilder.ofInt) += i
      i += 1
    }
    (m.view.mapValues(_.result()).toMap, i)
  }

  /** Query analysis: distinct terms, first-occurrence order (frozen —
    * BM25 sums contributions in this order; oracle matches). */
  def analyzeQuery(q: String): Seq[String] = analyze(q).distinct
}

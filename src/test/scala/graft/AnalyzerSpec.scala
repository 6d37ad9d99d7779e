package graft

import graft.analyze.CodeAnalyzer
import org.scalatest.funsuite.AnyFunSuite

/** Golden cases FREEZE the analyzer semantics (SURVEY.md §7.3-2): index
  * layout and BM25 parity depend on these never drifting. */
class AnalyzerSpec extends AnyFunSuite {
  import CodeAnalyzer._

  test("simple words: lowercase, stopwords and short tokens dropped") {
    assert(analyze("The quick brown fox is on a log") ===
      Seq("quick", "brown", "fox", "log"))
  }

  test("camelCase splits and preserves the original") {
    assert(analyze("computeHashValue") ===
      Seq("compute", "hash", "value", "computehashvalue"))
  }

  test("acronym boundary: HTTPServer -> http, server (+original)") {
    assert(analyze("HTTPServer") === Seq("http", "server", "httpserver"))
  }

  test("snake_case splits; original keeps underscores") {
    assert(analyze("block_max_score") ===
      Seq("block", "max", "score", "block_max_score"))
  }

  test("digit boundaries: foo2Bar") {
    // parts foo|2|Bar: '2' dropped (pure digits), original kept
    assert(analyze("foo2Bar") === Seq("foo", "bar", "foo2bar"))
  }

  test("punctuation is a separator; single letters dropped") {
    assert(analyze("x = a.b + c;") === Nil)
    assert(analyze("val x = readBlock(buf, 42)") ===
      Seq("val", "read", "block", "readblock", "buf"))
  }

  test("pure digit runs are dropped, alphanumerics kept") {
    assert(analyze("12345 ab12") === Seq("ab", "ab12"))
  }

  test("empty / null safe") {
    assert(analyze("") === Nil)
    assert(analyze(null) === Nil)
  }

  test("termFreqs counts and docLen") {
    // tokens: merge, merge, merge, [the dropped], merge, sort, mergesort
    val (tf, dl) = termFreqs("merge merge Merge the mergeSort")
    assert(tf("merge") === 4)
    assert(tf("sort") === 1)
    assert(tf("mergesort") === 1)
    assert(dl === 6) // docLen = total emitted tokens post-filter
  }

  test("termPositions: positions index the post-filter emission sequence") {
    val (tp, dl) = graft.analyze.CodeAnalyzer
      .termPositions("merge the join mergeSort merge")
    // emission: merge(0) join(1) [the dropped] merge(2) sort(3)
    //           mergesort(4) merge(5)
    assert(dl === 6)
    assert(tp("merge").toSeq === Seq(0, 2, 5))
    assert(tp("join").toSeq === Seq(1))
    assert(tp("sort").toSeq === Seq(3))
    assert(tp("mergesort").toSeq === Seq(4))
    // tf == positions.length, consistent with termFreqs
    val (tf, dl2) = graft.analyze.CodeAnalyzer
      .termFreqs("merge the join mergeSort merge")
    assert(dl2 === dl)
    tp.foreach { case (t, ps) => assert(tf(t) === ps.length, t) }
  }

  test("query analysis dedups, keeps first-occurrence order") {
    assert(analyzeQuery("merge sort merge buildPostingList") ===
      Seq("merge", "sort", "build", "posting", "list", "buildpostinglist"))
  }

  test("splitWord edge cases") {
    assert(splitWord("fooBar") === Seq("foo", "Bar"))
    assert(splitWord("HTTPServerConfig") === Seq("HTTP", "Server", "Config"))
    assert(splitWord("__init__") === Seq("init"))
    assert(splitWord("a_b_c") === Seq("a", "b", "c"))
    assert(splitWord("v2") === Seq("v", "2"))
  }
}

package graft

import graft.analyze.CodeAnalyzer
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** r8 pin: the span-keyed build-path fusion (termPositionsSorted) must
  * agree exactly with the reference composition analyze() ->
  * positions-by-term -> sort, on adversarial inputs (unicode, digits,
  * underscores, camel runs, empty). Fixed seed. */
class AnalyzerFusionSpec extends AnyFunSuite {

  private def reference(content: String): (Seq[(String, Seq[Int])], Int) = {
    val toks = CodeAnalyzer.analyze(content)
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Int]]
    toks.zipWithIndex.foreach { case (t, i) =>
      m(t) = m.getOrElse(t, Vector.empty) :+ i
    }
    (m.toSeq.sortBy(_._1).map { case (t, ps) => (t, ps: Seq[Int]) }, toks.length)
  }

  private def fused(content: String): (Seq[(String, Seq[Int])], Int) = {
    val (tps, dl) = CodeAnalyzer.termPositionsSorted(content)
    (tps.toSeq.map { case (t, ps) => (t, ps.toSeq) }, dl)
  }

  test("termPositionsSorted == analyze-derived reference on random inputs") {
    val rnd = new Random(8802L)
    val atoms = Seq("fooBar", "HTTPServer", "foo2Bar", "the", "a", "if",
      "snake_case_id", "_lead", "trail_", "x", "ab", "A1", "42", "007",
      "mergeSortedRuns", "MERGE", "é", "naïve", "日本語", "a_b_c", "__",
      "Z9z", "UPPERlower", "m1X2y3")
    val seps = Seq(" ", "\n", "\t", ".", "(", ");", "//", "--", "", "  ")
    (1 to 400).foreach { _ =>
      val n = rnd.nextInt(60)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        sb.append(atoms(rnd.nextInt(atoms.length)))
        sb.append(seps(rnd.nextInt(seps.length)))
      }
      val s = sb.toString
      assert(fused(s) == reference(s), s"diverges on: '$s'")
    }
    // edges
    Seq("", " ", "_", "____", "42 17", "the a if").foreach { s =>
      assert(fused(s) == reference(s), s"edge '$s'")
    }
  }

  test("termPositionsSorted handles null/empty like termPositions") {
    assert(CodeAnalyzer.termPositionsSorted(null)._2 == 0)
    assert(CodeAnalyzer.termPositionsSorted("")._2 == 0)
    assert(CodeAnalyzer.termPositionsSorted(null)._1.isEmpty)
  }

  test("SESSION reuse across docs == stateless per-doc analysis (interning)") {
    val rnd = new Random(8803L)
    val atoms = Seq("fooBar", "HTTPServer", "foo2Bar", "the", "a", "if",
      "snake_case_id", "_lead", "trail_", "x", "ab", "A1", "42", "007",
      "mergeSortedRuns", "MERGE", "é", "naïve", "日本語", "a_b_c", "__",
      "Z9z", "UPPERlower", "m1X2y3")
    val seps = Seq(" ", "\n", "\t", ".", "(", ");", "//", "--", "", "  ")
    val session = new CodeAnalyzer.AnalyzerSession
    // one session fed 300 documents (shared vocabulary => interning
    // exercised; occasional fresh tokens => intern growth exercised)
    (1 to 300).foreach { docNo =>
      val n = rnd.nextInt(80)
      val sb = new StringBuilder
      (0 until n).foreach { k =>
        sb.append(atoms(rnd.nextInt(atoms.length)))
        if (rnd.nextInt(10) == 0) sb.append("uniq").append(docNo).append("x").append(k)
        sb.append(seps(rnd.nextInt(seps.length)))
      }
      val s = sb.toString
      val (sTps, sDl) = session.termPositionsSorted(s)
      val (rTps, rDl) = CodeAnalyzer.termPositionsSorted(s)
      assert(sDl == rDl, s"dl diverges on doc $docNo: '$s'")
      assert(sTps.toSeq.map { case (t, ps) => (t, ps.toSeq) } ==
        rTps.toSeq.map { case (t, ps) => (t, ps.toSeq) },
        s"terms diverge on doc $docNo: '$s'")
    }
  }

  test("session emitted position arrays do not alias the reused pool") {
    val session = new CodeAnalyzer.AnalyzerSession
    val (tps1, _) = session.termPositionsSorted("alpha beta alpha gamma beta alpha")
    val snapshot = tps1.map { case (t, ps) => (t, ps.clone()) }
    // next doc reuses the pooled buffers; the first doc's arrays must not move
    session.termPositionsSorted("delta epsilon delta zeta epsilon phi chi psi")
    session.termPositionsSorted("alpha beta gamma " * 50)
    tps1.zip(snapshot).foreach { case ((t, ps), (t2, ps2)) =>
      assert(t == t2 && ps.sameElements(ps2), s"aliased positions for '$t'")
    }
  }

  test("many distinct terms force map growth past several rehashes") {
    // all-letter tokens (digits would trigger the letter<->digit split)
    val s = (0 until 5000)
      .map(i => "tok" + i.toString.map(c => ('a' + c - '0').toChar))
      .mkString(" ")
    val (tps, dl) = CodeAnalyzer.termPositionsSorted(s)
    assert(dl == 5000)
    assert(tps.length == 5000)
    assert(tps.map(_._1).toSeq == tps.map(_._1).toSeq.sorted)
    assert(tps.forall(_._2.length == 1))
  }
}

package graft.tools

import graft.analyze.CodeAnalyzer
import graft.corpus.CorpusGen
import graft.index.{Codec, IndexBuilder, TermFreq}

/** Single-threaded microbenchmark of the per-doc build pipeline:
  * gen / analyze / termPositions / sha256 / position-encode / term sort.
  * Usage: runMain graft.tools.DocMicro [nDocs] */
object DocMicro {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val docs = (0 until n).map(i => CorpusGen.doc(42L, i.toLong)).toArray
    def timed(name: String)(f: => Long): Unit = {
      // warm
      f
      val t0 = System.nanoTime()
      val sink = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[micro] $name%-28s ${sec}%8.3f s  (${sec * 1e6 / n}%8.1f us/doc, sink=${sink % 97})")
    }
    timed("gen") {
      var s = 0L
      var i = 0
      while (i < n) { s += CorpusGen.doc(42L, i.toLong).content.length; i += 1 }
      s
    }
    timed("analyze (tokens only)") {
      var s = 0L
      docs.foreach(d => s += CodeAnalyzer.analyze(d.content).length)
      s
    }
    timed("termPositions") {
      var s = 0L
      docs.foreach(d => s += CodeAnalyzer.termPositions(d.content)._2)
      s
    }
    timed("sha256Hex") {
      var s = 0L
      docs.foreach(d => s += IndexBuilder.sha256Hex(d.content).length)
      s
    }
    timed("termPositions+sort+encode") {
      var s = 0L
      docs.foreach { d =>
        val (tpm, dl) = CodeAnalyzer.termPositions(d.content)
        val terms = tpm.toArray.sortBy(_._1).map { case (t, ps) =>
          TermFreq(t, ps.length, Codec.encodePositions(Array(ps)))
        }
        s += dl + terms.length
      }
      s
    }
    timed("termPositionsSorted+encode") {
      var s = 0L
      docs.foreach { d =>
        val (tps, dl) = CodeAnalyzer.termPositionsSorted(d.content)
        var k = 0
        while (k < tps.length) {
          s += Codec.encodePositions(Array(tps(k)._2)).length
          k += 1
        }
        s += dl
      }
      s
    }
    timed("session+encode (build path)") {
      var s = 0L
      val session = new CodeAnalyzer.AnalyzerSession
      docs.foreach { d =>
        val (tps, dl) = session.termPositionsSorted(d.content)
        var k = 0
        while (k < tps.length) {
          s += Codec.encodePositions(Array(tps(k)._2)).length
          k += 1
        }
        s += dl
      }
      s
    }
  }
}

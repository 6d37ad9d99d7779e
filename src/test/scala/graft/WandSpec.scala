package graft

import graft.index._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** FIXTURES.md §5 WAND property: for random corpora and queries, WAND
  * top-k == exhaustive BM25 top-k — same docIDs, same scores, same order,
  * ties broken by docId asc. Also covers the conjunctive (AND-group)
  * iterator vs a naive intersection. */
class WandSpec extends AnyFunSuite {

  private val vocab = Array("alpha", "beta", "gamma", "delta", "merge",
    "sort", "index", "query", "block", "skip", "term", "shard", "hash",
    "scan", "read", "write", "codec", "heap")

  private def randomCorpus(rnd: Random, nDocs: Int): Seq[(Long, String)] =
    (0 until nDocs).map { i =>
      val len = 1 + rnd.nextInt(60)
      val words = Seq.fill(len)(vocab(rnd.nextInt(vocab.length)))
      // shard-prefixed sparse ids like the real engine produces
      val docId = ((i % 4).toLong << 40) | (i / 4).toLong
      (docId, words.mkString(" "))
    }

  /** Build cursors straight from the codec (single sub-list per term). */
  private def cursorsFor(oracle: NaiveIndex, terms: Seq[String])
      : Map[String, PostingCursor] =
    terms.flatMap { t =>
      oracle.postings.get(t).map { pl =>
        val docs = pl.map(_._1)
        val tfs = pl.map(_._2)
        val dls = pl.map(p => oracle.docLen(p._1))
        val enc = Codec.encode(docs, tfs, dls, blockSize = 8) // tiny blocks: exercise skips
        val skips = enc.skips.map(s => SkipRow(s.firstDoc, s.lastDoc, s.maxTf, s.minDl)).toSeq
        t -> new PostingCursor(t, oracle.bm25.idf(pl.length.toLong),
          Seq((enc.blocks.toSeq, skips)), oracle.bm25)
      }
    }.toMap

  test("WAND == exhaustive on 50 random corpora x queries") {
    val rnd = new Random(7)
    (1 to 50).foreach { round =>
      val corpus = randomCorpus(rnd, 30 + rnd.nextInt(300))
      val oracle = new NaiveIndex(corpus)
      val nq = 1 + rnd.nextInt(4)
      val qterms = Seq.fill(nq)(vocab(rnd.nextInt(vocab.length))).distinct
      val k = 1 + rnd.nextInt(15)
      val expected = oracle.topK(qterms.mkString(" "), k)
      val got = WandScorer.topK(qterms, cursorsFor(oracle, qterms), k)
      assert(got.map(_.docId) === expected.map(_.docId), s"round $round docIds")
      got.zip(expected).foreach { case (g, e) =>
        assert(g.score === e.score, s"round $round score for doc ${g.docId}")
      }
    }
  }

  test("conjunctive iterator == naive intersection") {
    val rnd = new Random(13)
    (1 to 30).foreach { round =>
      val corpus = randomCorpus(rnd, 50 + rnd.nextInt(200))
      val oracle = new NaiveIndex(corpus)
      val group = Seq.fill(2 + rnd.nextInt(2))(vocab(rnd.nextInt(vocab.length))).distinct
      val present = group.filter(oracle.postings.contains)
      if (present.length == group.length) {
        val got = WandScorer.conjunctive(group, cursorsFor(oracle, group)).toSeq
        // naive: docs containing every term
        val sets = group.map(t => oracle.postings(t).map(_._1).toSet)
        val common = sets.reduce(_ intersect _).toSeq.sorted
        assert(got.map(_.docId) === common, s"round $round")
        got.foreach { sd =>
          var s = 0.0
          group.foreach { t =>
            val tf = oracle.postings(t).find(_._1 == sd.docId).get._2
            s += oracle.bm25.score(oracle.bm25.idf(oracle.df(t)), tf, oracle.docLen(sd.docId))
          }
          assert(sd.score === s, s"round $round doc ${sd.docId}")
        }
      }
    }
  }

  test("tie-break: equal scores ordered by docId asc") {
    // identical docs => identical scores; top-k must pick lowest docIds
    val docs = (0 until 20).map(i => (100L - i, "alpha beta alpha"))
    val oracle = new NaiveIndex(docs)
    val top = oracle.topK("alpha", 5)
    assert(top.map(_.docId) === Seq(81L, 82L, 83L, 84L, 85L))
    val wand = WandScorer.topK(Seq("alpha"), cursorsFor(oracle, Seq("alpha")), 5)
    assert(wand.map(_.docId) === top.map(_.docId))
    assert(wand.map(_.score) === top.map(_.score))
  }
}

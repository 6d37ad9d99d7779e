package graft

import graft.corpus.CorpusDoc
import graft.index._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The north rule's skew requirement, tested directly: a term present in
  * EVERY document (the worst hot stopword) must never form a single
  * reducer group — document-sharding bounds each posting sub-list by the
  * shard size, and the query path still answers exactly. */
class SkewSpec extends AnyFunSuite with SparkSessionFixture {

  private val nDocs = 2000
  private val numShards = 8

  private lazy val root: String = {
    import spark.implicits._
    val work = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "skew").toString
    val r = s"$work/index"
    // every doc contains the hot term 'omnipresent' many times; a long
    // tail of rare terms rides along
    val corpus = spark.range(0, nDocs).map { i =>
      val rare = s"raretoken$i"
      CorpusDoc(f"repo-${i % 7}%04d", s"src/f$i.scala", f"$i%040d", "scala",
        s"omnipresent $rare omnipresent filler omnipresent " * 5)
    }
    IndexBuilder.build(spark, corpus, r, numShards)
    r
  }

  test("hot-term postings are split across ALL shards (bounded groups)") {
    val eng = new QueryEngine(spark, root)
    val rows = eng.postings.where(col("term") === "omnipresent")
      .select("shard", "df").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.length === numShards, s"expected $numShards sub-lists, got ${rows.length}")
    assert(rows.map(_._2).sum === nDocs.toLong)
    // no shard owns more than ~3x its fair share (hash balance)
    val maxShare = rows.map(_._2).max.toDouble / (nDocs.toDouble / numShards)
    assert(maxShare < 3.0, s"skewed shard share $maxShare")
  }

  test("rare terms have single tiny sub-lists; hot query still exact") {
    val eng = new QueryEngine(spark, root)
    val rare = eng.postings.where(col("term") === "raretoken42").collect()
    assert(rare.length === 1)

    // exact parity on a query mixing the hottest and a rare term
    val meta = eng.docmeta.select("docId", "path").collect()
      .map(r => (r.getLong(0), r.getString(1).stripPrefix("src/f").stripSuffix(".scala").toLong))
    val contentById = meta.map { case (docId, i) =>
      docId -> (s"omnipresent raretoken$i omnipresent filler omnipresent " * 5)
    }
    val oracle = new NaiveIndex(contentById.toSeq)
    Seq("omnipresent", "omnipresent raretoken42", "raretoken7 filler").foreach { q =>
      val got = eng.topK(q, 10)
      val exp = oracle.topK(q, 10)
      assert(got.map(_.docId) === exp.map(_.docId), s"query '$q'")
      got.zip(exp).foreach { case (g, e) => assert(g.score === e.score) }
    }
  }

  test("hot-term postings compress hard (dense delta-1 runs)") {
    val eng = new QueryEngine(spark, root)
    val bytes = eng.postings.where(col("term") === "omnipresent")
      .agg(sum("bytes")).head().getLong(0)
    // 2000 postings; PForDelta should stay around ~2 bytes/posting
    assert(bytes < 3L * nDocs, s"hot-term bytes/posting = ${bytes.toDouble / nDocs}")
  }
}

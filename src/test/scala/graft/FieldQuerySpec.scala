package graft

import graft.corpus.CorpusGen
import graft.index._
import graft.table.IcebergLite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.util.Random

/** Field-scoped and range query syntax (`lang:scala term`,
  * `id:[a TO b]`) — the Lucene query_string field grammar compiled onto
  * the engine's filtered-search machinery (SURVEY §2.8 X18):
  *  - parser pins (grammar, precedence, loud rejects);
  *  - engine parity vs the exhaustive in-memory oracle on random
  *    field-gated boolean AND scored queries, on BOTH the driver fast
  *    path and the forced distributed/cogrouped path;
  *  - the format-gate sniff for unstamped-but-compatible roots
  *    (ADVICE r6 medium).
  */
class FieldQuerySpec extends AnyFunSuite with SparkSessionFixture {

  private val nDocs = 400L
  private val numShards = 4
  private lazy val work = Files.createTempDirectory(
    Paths.get("/root/repo/target"), "field-spec").toString

  private lazy val corpusDocs = (0L until nDocs).map(i => CorpusGen.doc(91L, i))

  private lazy val indexRoot = s"$work/index"
  private lazy val engine: QueryEngine = {
    val ds = CorpusGen.dataset(spark, nDocs, 91L, 6)
    IndexBuilder.build(spark, ds, indexRoot, numShards,
      tableIdOf = Some(d =>
        d.path.replaceAll(""".*file_([0-9]+)\..*""", "$1").toLong))
    new QueryEngine(spark, indexRoot)
  }

  /** Exhaustive oracle with engine docIds + per-doc metadata lookups. */
  private lazy val (oracle, metaOf) = {
    val meta = engine.docmeta
      .select("docId", "repo", "path", "commit", "lang", "docLen", "tableId")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getInt(5), r.getLong(6)))
      .toMap
    val byKey = corpusDocs.map(d => (d.repo, d.path, d.commit) -> d.content).toMap
    val naive = new NaiveIndex(meta.toSeq.map { case (id, m) =>
      (id, byKey((m._1, m._2, m._3))) })
    val fieldVal: (Long, String) => Any = (id, f) => f match {
      case "repo" => meta(id)._1
      case "path" => meta(id)._2
      case "commit" => meta(id)._3
      case "lang" => meta(id)._4
      case "dlen" => meta(id)._5
      case "id" => meta(id)._6
      case other => throw new IllegalArgumentException(other)
    }
    (naive, fieldVal)
  }

  // ---- parser pins --------------------------------------------------------

  test("splitFieldFilters: ranges + bare fields out, residual intact") {
    val (res, fs) = QueryParser.splitFieldFilters(
      "spark query join lang:en id:[100 TO 400]")
    assert(res === "spark query join")
    assert(fs.map(_.field) === Seq("id", "lang")) // range extracted first
    assert(fs.find(_.field == "lang").get.eq === Some("en"))
    val idF = fs.find(_.field == "id").get
    assert(idF.lo === Some("100") && idF.hi === Some("400") &&
      idF.loInc && idF.hiInc)
  }

  test("splitFieldFilters: negation, exclusive bounds, open bounds") {
    val (res, fs) = QueryParser.splitFieldFilters(
      "merge -lang:fr dlen:{10 TO *}")
    assert(res === "merge")
    assert(fs.find(_.field == "lang").get.neg)
    val dl = fs.find(_.field == "dlen").get
    assert(dl.lo === Some("10") && dl.hi === None && !dl.loInc)
  }

  test("unknown bare field falls through to the analyzer; unknown range rejects") {
    val (res, fs) = QueryParser.splitFieldFilters("spark date:2020")
    assert(fs.isEmpty && res === "spark date:2020") // pre-field behavior kept
    intercept[IllegalArgumentException] {
      QueryParser.splitFieldFilters("spark date:[1 TO 2]")
    }
    intercept[IllegalArgumentException] { // numeric field, junk value
      QueryParser.splitFieldFilters("spark id:abc")
    }
    intercept[IllegalArgumentException] { // both bounds open
      QueryParser.splitFieldFilters("spark id:[* TO *]")
    }
  }

  test("parseGroups: per-group fields, pinned for the q93 query") {
    val gs = QueryParser.parseGroups(graft.ops.SearchOps.FieldMatchQuery)
    assert(gs.length === 2)
    assert(gs(0).terms === Seq("merge", "join"))
    assert(gs(0).fields.map(f => (f.field, f.eq)) === Seq(("lang", Some("en"))))
    assert(gs(1).terms === Seq("spark", "scan"))
    assert(gs(1).fields.map(f => (f.field, f.lo, f.hi)) ===
      Seq(("id", Some("0"), Some("250"))))
  }

  test("field-only groups reject loudly (boolean and scored)") {
    intercept[IllegalArgumentException] {
      QueryParser.parseGroups("lang:en")
    }
    intercept[IllegalArgumentException] {
      QueryParser.parseGroups("spark, lang:en -window")
    }
    intercept[IllegalArgumentException] {
      engine.topKQS("lang:scala", 5)
    }
  }

  test("predicateSql escapes string values; numeric stays bare") {
    val f = FieldFilter("path", neg = false, Some("o'brien"), None, None)
    assert(f.predicateSql === "path = 'o''brien'")
    val r = FieldFilter("id", neg = true, None, Some("5"), Some("9"),
      loInc = true, hiInc = false)
    assert(r.predicateSql === "(NOT ((tableId >= 5 AND tableId < 9)))")
  }

  // ---- engine parity ------------------------------------------------------

  private def topTerms(n: Int): Seq[String] =
    oracle.postings.toSeq.sortBy { case (t, pl) => (-pl.length, t) }
      .take(n).map(_._1)

  private def randomFieldAtom(rnd: Random): String = {
    val langs = Seq("scala", "java", "py", "go", "md")
    rnd.nextInt(4) match {
      case 0 => s"lang:${langs(rnd.nextInt(langs.length))}"
      case 1 => s"-lang:${langs(rnd.nextInt(langs.length))}"
      case 2 =>
        val lo = rnd.nextInt(200); val hi = lo + 20 + rnd.nextInt(300)
        s"id:[$lo TO $hi]"
      case 3 =>
        val lo = 5 + rnd.nextInt(40)
        s"dlen:[$lo TO ${lo + 20 + rnd.nextInt(60)}]"
    }
  }

  test("boolean field gates: engine == exhaustive on 25 random queries") {
    val rnd = new Random(331)
    val terms = topTerms(12)
    (1 to 25).foreach { round =>
      val nGroups = 1 + rnd.nextInt(2)
      val q = (1 to nGroups).map { _ =>
        val gTerms = Seq.fill(1 + rnd.nextInt(2))(
          terms(rnd.nextInt(terms.length))).distinct
        val atoms = (1 to 1 + rnd.nextInt(2)).map(_ => randomFieldAtom(rnd))
        (gTerms ++ atoms).mkString(" ")
      }.mkString(", ")
      val k = 5 + rnd.nextInt(10)
      val got = engine.booleanTopK(q, k)
      val exp = oracle.booleanTopK(q, k, metaOf)
      assert(got.map(_.docId) === exp.map(_.docId), s"round $round q='$q'")
      got.zip(exp).foreach { case (g, e) =>
        assert(g.score === e.score, s"round $round doc ${g.docId} q='$q'") }
    }
  }

  test("scored field gates (topKQS): engine == exhaustive, scores GLOBAL") {
    val rnd = new Random(337)
    val terms = topTerms(12)
    (1 to 20).foreach { round =>
      val qTerms = Seq.fill(1 + rnd.nextInt(3))(
        terms(rnd.nextInt(terms.length))).distinct
      val atoms = (1 to 1 + rnd.nextInt(2)).map(_ => randomFieldAtom(rnd))
      val q = (qTerms ++ atoms).mkString(" ")
      val k = 5 + rnd.nextInt(10)
      val (residual, fs) = QueryParser.splitFieldFilters(q)
      assert(residual === qTerms.mkString(" "))
      val got = engine.topKQS(q, k)
      val exp = oracle.topKFiltered(residual, k,
        id => fs.forall(f => f.matches(metaOf(id, f.field))))
      assert(got.map(_.docId) === exp.map(_.docId), s"round $round q='$q'")
      got.zip(exp).foreach { case (g, e) =>
        assert(g.score === e.score, s"round $round doc ${g.docId} q='$q'") }
      // filter context: a surviving doc's score must equal its unfiltered
      // score (global statistics — the ES contract)
      val unfiltered = engine.topK(residual, 10000).map(s => s.docId -> s.score).toMap
      got.foreach(s => assert(unfiltered(s.docId) === s.score,
        s"round $round stats leaked into doc ${s.docId}"))
    }
  }

  test("match set with field gates: engine == exhaustive, both paths") {
    val rnd = new Random(347)
    val terms = topTerms(10)
    // a second engine whose driver gate is closed: every query takes the
    // DISTRIBUTED cogrouped path — the scale shape q93 rides
    val distEngine = new QueryEngine(spark, indexRoot, driverPathMaxPostings = 1)
    (1 to 8).foreach { round =>
      val q = Seq(
        s"${terms(rnd.nextInt(terms.length))} ${randomFieldAtom(rnd)}",
        s"${terms(rnd.nextInt(terms.length))} ${randomFieldAtom(rnd)}"
      ).mkString(", ")
      val exp = oracle.booleanTopK(q, nDocs.toInt * 2, metaOf)
        .map(_.docId).toSet
      val got = engine.matchingDocIds(q)
        .collect().map(_.getLong(0)).toSet
      assert(got === exp, s"round $round driver-path q='$q'")
      val gotDist = distEngine.matchingDocIds(q)
        .collect().map(_.getLong(0)).toSet
      assert(gotDist === exp, s"round $round distributed-path q='$q'")
    }
    // the distributed scored path too (cogroup + required cursor)
    val q = s"${terms.head} lang:scala dlen:[10 TO 200]"
    assert(distEngine.topKQS(q, 10) === engine.topKQS(q, 10))
  }

  test("match_topk operator path honors field syntax (scored + filter arg)") {
    engine // force build
    val viaOp = graft.GraftSql.search(spark, indexRoot,
      "posting reader lang:scala", 8)
      .select("docId", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val direct = engine.topKQS("posting reader lang:scala", 8)
      .map(s => (s.docId, s.score))
    assert(viaOp === direct)
    // field atom ANDs with an explicit TVF filter argument (the TVF
    // needs the extension-built session — the static-conf workaround
    // MatchTopKSpec documents)
    val old = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val both = s2.sql(
        s"""SELECT docId, score FROM match_topk('$indexRoot',
           |'posting reader lang:scala', 8, false, 'docLen >= 20')""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val expect = new QueryEngine(s2, indexRoot)
        .topKFiltered("posting reader", 8, "lang = 'scala' AND docLen >= 20")
        .map(s => (s.docId, s.score))
      assert(both.toSet === expect.toSet)
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(old)
      org.apache.spark.sql.SparkSession.setDefaultSession(old)
    }
  }

  test("row-level match() rejects field atoms loudly") {
    import spark.implicits._
    graft.GraftSql.ensureMatchSupport(spark)
    // a derived (non-parquet-backed) relation: the rewrite cannot fire,
    // so evaluation falls to the row-level predicate — which must refuse
    // the field gate rather than silently dropping it
    Seq((1L, "spark merge", "en")).toDF("doc_id", "text", "lang")
      .createOrReplaceTempView("field_roweval_docs")
    val err = intercept[Exception] {
      spark.sql(
        "SELECT doc_id FROM field_roweval_docs WHERE match(text, 'spark lang:en')")
        .collect()
    }
    assert(err.getMessage.contains("field-scoped") ||
      Option(err.getCause).exists(_.getMessage.contains("field-scoped")))
  }

  // ---- format-gate sniff (ADVICE r6 medium) -------------------------------

  test("unstamped manifest over a v4 layout opens via the schema sniff") {
    val root = s"$work/sniff-ok"
    val ds = CorpusGen.dataset(spark, 80L, 7L, 4)
    IndexBuilder.build(spark, ds, root, numShards = 2)
    val tbl = new IcebergLite(root)
    val m = tbl.currentManifest().get
    assert(m.format.contains(IndexBuilder.FormatVersion))
    tbl.commit(m.copy(version = m.version + 1, format = None)) // de-stamp
    val eng = new QueryEngine(spark, root) // must open, not reject
    assert(eng.topK("def", 3).nonEmpty || eng.topK("val", 3).nonEmpty)
    // and the next writer commit re-stamps
    IndexBuilder.build(spark, CorpusGen.dataset(spark, 40L, 11L, 4),
      root, numShards = 2, batch = 1)
    assert(new IcebergLite(root).currentManifest().get.format
      .contains(IndexBuilder.FormatVersion))
  }

  test("unstamped manifest whose parquet lacks the v4 columns still rejects") {
    val root = s"$work/sniff-bad"
    val ds = CorpusGen.dataset(spark, 60L, 9L, 4)
    IndexBuilder.build(spark, ds, root, numShards = 2)
    val tbl = new IcebergLite(root)
    val m = tbl.currentManifest().get
    val seg = m.segments.head.name
    // simulate a pre-v4 segment: rewrite postings without posBlocks
    val p = spark.read.parquet(s"$root/$seg/postings").drop("posBlocks")
    p.write.mode("overwrite").parquet(s"$root/$seg/postings_nopos")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$root/$seg/postings"))
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(s"$root/$seg/postings_nopos"),
      new java.io.File(s"$root/$seg/postings"))
    tbl.commit(m.copy(version = m.version + 1, format = None))
    val e = intercept[IllegalStateException] { new QueryEngine(spark, root) }
    assert(e.getMessage.contains("rebuild"))
  }
}

package graft.ops

import graft.corpus.CorpusDoc
import graft.index.{IndexBuilder, QueryEngine}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Search operators over the driver's `documents` table.
 *
 * qBm25TopK expresses exact BM25 top-k as a PURE CATALYST PLAN (per-term
 * tf columns from array filters, stats via a broadcast single-row cross
 * join, fixed-order float summation) — one scan, one tiny agg, no
 * shuffle of the documents themselves. It is SQL-expressible, so the
 * DuckDB oracle verifies the engine's scoring math end-to-end.
 *
 * qEngineSearch runs the REAL index path (IndexBuilder + QueryEngine,
 * segments on disk) over documents mapped into the corpus shape; parity
 * with the in-memory oracle is covered by IndexEndToEndSpec.
 */
object SearchOps {
  import Tables._

  val QueryTerms = Seq("spark", "query", "join") // frozen demo query
  val K1 = 1.2
  val B = 0.75

  def qBm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), analyzedToks(col("text")).as("toks"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n"),
      avg(size(col("toks")).cast("double")).as("avgdl"))
    val tfCols = QueryTerms.zipWithIndex.map { case (term, i) =>
      size(filter(col("toks"), w => w === term)).as(s"tf$i")
    }
    val withTf = docs.select(col("doc_id") +: size(col("toks")).as("dl") +: tfCols: _*)
    val dfCols = QueryTerms.indices.map(i =>
      sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("double").as(s"df$i"))
    val dfAgg = withTf.agg(dfCols.head, dfCols.tail: _*)
    val scored = withTf
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfAgg))
    // fixed-order sum: s = s0 + s1 + s2 (query-term order, frozen)
    val termScore: Int => Column = i => {
      val tf = col(s"tf$i").cast("double")
      val idf = log(lit(1.0) + (col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5))
      when(col(s"tf$i") > 0,
        idf * (tf * (K1 + 1.0)) /
          (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") / col("avgdl"))))
        .otherwise(0.0)
    }
    val score = QueryTerms.indices.map(termScore).reduceLeft(_ + _)
    scored.select(col("doc_id"), score.as("score_raw"))
      .where(col("score_raw") > 0.0)
      .orderBy(desc("score_raw"), asc("doc_id"))
      .limit(10)
      .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
  }

  /** The matching DuckDB SQL (same analyzer filter, same formula, same
    * fixed summation order) — generated so term list/stoplist stay in
    * lockstep with the Spark plan. */
  def bm25OracleSql: String = {
    val stops = stopListSql
    val tfDefs = QueryTerms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, w -> w = '$t')) AS tf$i"
    }.mkString(", ")
    val dfDefs = QueryTerms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i").mkString(", ")
    val scoreExpr = QueryTerms.indices.map(i =>
      s"(CASE WHEN tf$i > 0 THEN ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * " +
      s"(CAST(tf$i AS DOUBLE) * ${K1 + 1.0}) / (CAST(tf$i AS DOUBLE) + $K1 * " +
      s"(1.0 - $B + $B * CAST(dl AS DOUBLE) / avgdl)) ELSE 0.0 END)")
      .mkString(" + ")
    s"""WITH docs AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '),
       |    w -> length(w) >= 2 AND NOT regexp_full_match(w, '[0-9]+')
       |         AND w NOT IN $stops) AS toks
       |  FROM documents),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |                 avg(CAST(len(toks) AS DOUBLE)) AS avgdl FROM docs),
       |tf AS (SELECT doc_id, len(toks) AS dl, $tfDefs FROM docs),
       |dfs AS (SELECT $dfDefs FROM tf),
       |scored AS (SELECT doc_id, $scoreExpr AS score_raw FROM tf, stats, dfs)
       |SELECT doc_id, round(score_raw, 4) AS score FROM scored
       |WHERE score_raw > 0.0 ORDER BY score_raw DESC, doc_id LIMIT 10""".stripMargin
  }

  /** The code-aware analyzer exposed to SQL as a native codegen'd
    * Catalyst expression (graft.functions.CodeTokenize). On the plain
    * lowercase `documents` text the analyzer reduces to the filtered
    * whitespace split, so this one IS DuckDB-oracle-able; the camelCase /
    * snake_case paths are frozen by AnalyzerSpec + FunctionSpec. */
  def qCodeTokenize(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    t(spark, dir, "documents").createOrReplaceTempView("graft_docs")
    spark.sql(
      """SELECT doc_id, CAST(size(toks) AS BIGINT) AS n_toks,
        |       element_at(toks, 1) AS first_tok, element_at(toks, -1) AS last_tok
        |FROM (SELECT doc_id, code_tokenize(text) AS toks FROM graft_docs)
        |WHERE size(toks) > 0 ORDER BY doc_id""".stripMargin)
  }

  def codeTokenizeOracleSql: String =
    s"""SELECT doc_id, len(toks) AS n_toks, toks[1] AS first_tok, toks[-1] AS last_tok
       |FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '),
       |  w -> length(w) >= 2 AND NOT regexp_full_match(w, '[0-9]+')
       |       AND w NOT IN $stopListSql) AS toks FROM documents)
       |WHERE len(toks) > 0 ORDER BY doc_id""".stripMargin

  // ---- real engine over documents-as-corpus ------------------------------

  private val engineCache = scala.collection.mutable.HashMap.empty[String, QueryEngine]

  def workDir: String = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graftwork")

  /** Map the documents table into the corpus shape and build a real
    * on-disk index (cached per dataset dir within the JVM). */
  def docEngine(spark: SparkSession, dir: String): QueryEngine = synchronized {
    engineCache.getOrElseUpdate(dir, {
      import spark.implicits._
      val corpus = t(spark, dir, "documents")
        .select(col("source").as("repo"),
          concat(lit("doc_"), col("doc_id")).as("path"),
          md5(col("text")).as("commit"),
          col("lang"), col("text").as("content"))
        .as[CorpusDoc]
      val root = s"$workDir/doc-index-${IndexBuilder.sha256Hex(dir).take(12)}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      IndexBuilder.build(spark, corpus, root, numShards = 8)
      new QueryEngine(spark, root)
    })
  }

  /** Real segmented-index BM25 search (disjunctive). */
  def qEngineSearch(spark: SparkSession, dir: String): DataFrame = {
    val eng = docEngine(spark, dir)
    eng.search(QueryTerms.mkString(" "), 10)
      .select(col("path"), round(col("score"), 4).as("score"))
  }

  /** Boolean keyword query through the engine ("spaces are ANDs commas
    * are ORs", /root/reference/sentiment.py:638-641). */
  def qEngineBool(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val eng = docEngine(spark, dir)
    val hits = eng.booleanTopK("spark query, merge join", 10)
    hits.map(h => (h.docId, math.rint(h.score * 10000) / 10000))
      .toDF("docId", "score")
      .join(eng.docmeta.select("docId", "path"), Seq("docId"))
      .select(col("path"), col("score"))
      .orderBy(desc("score"), asc("path"))
  }

  /** Per-segment doc/term/byte metrics from the committed manifest
    * (north-rule observability surface). */
  def qIndexMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val eng = docEngine(spark, dir)
    eng.manifest.segments
      .map(s => (s.name, s.metrics.docs, s.metrics.terms, s.metrics.postings,
        s.metrics.bytes))
      .toDF("segment", "docs", "terms", "postings", "bytes")
      .orderBy("segment")
  }
}

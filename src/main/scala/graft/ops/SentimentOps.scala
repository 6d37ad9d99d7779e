package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sentiment ensemble (SURVEY.md §2.4) as pure column expressions over the
 * Lexicon (an expanded published-VADER subset + documented domain fixture):
 *
 *  - U1 TextBlob-style scorer: mean over lexicon-matched tokens of
 *    valence/4 (pattern polarities live in [-1,1]), negation window
 *    scaling by -0.5 — TextBlob's core "average the assessed words".
 *  - U2 VADER scorer with the FULL published rule set (see Lexicon's
 *    scaladoc: negation decision tree, degree modifiers with distance
 *    damping, ALL-CAPS emphasis, punctuation amplification, but-clause
 *    re-weighting), normalized x/sqrt(x^2+15) clamped to [-1, 1] — the
 *    published compound formula (alpha = 15).
 *  - U4 ensemble vote / U5 polarity average reproduce
 *    /root/reference/sentiment.py:493-509 exactly:
 *      negative iff TB < 0  AND VADER <= -0.05
 *      positive iff TB > 0  AND VADER >= +0.05
 *      else neutral;  polarity = (TB + VADER) / 2
 *
 * Every fp operation runs in a frozen order, and the whole computation —
 * including all VADER rule stages — is regenerated as staged DuckDB CTEs
 * (`scoredSql`), so q24/q25/q27 are hash-verified end-to-end against an
 * independent engine.
 */
object SentimentOps {
  import Tables._
  import Lexicon._

  /** Fold-safe 4-decimal rounding (Tables.rd): floor(x*1e4 + 0.5)/1e4
    * computes the SAME double in Spark and DuckDB, unlike round(x, 4) —
    * Spark rounds the exact binary value (BigDecimal HALF_UP) while
    * DuckDB rounds a decimal rendering, and the two disagree on knife
    * edges like -0.056249999999999994 (observed on real data). Sentiment
    * outputs sit on such edges by construction, so this family uses r4
    * everywhere. */
  private def r4(c: Column): Column = Tables.rd(c, 4)
  private def r4Sql(e: String): String = Tables.rdSql(e, 4)

  /** RAW whitespace tokens, ORIGINAL case, empties dropped — the VADER
    * rules need case (ALL-CAPS emphasis) and attached punctuation
    * (stripping + '!'/'?' counting happen inside the scorer). */
  def rawToks(text: Column): Column =
    filter(split(text, " "), w => length(w) >= 1)

  /** (tb, vader, sentiment, polarity) columns for a text column. The
    * full rule walk (strip, caps, boosters, negation tree, least, but,
    * punctuation) runs as the native `sentiment_score` expression —
    * the pure-lambda formulation re-tokenized per index (CollapseProject
    * inlining; measured 9.9 s / 500 docs, ~500x slower). The compound
    * normalization (clamped, per the published normalize()) and the vote
    * stay visible column expressions. */
  def scored(text: Column): Seq[Column] = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.SentimentFunctions.register)
    val s = call_function("sentiment_score", rawToks(text))
    val tb = s.getField("tb")
    val x = s.getField("x")
    val vader = greatest(lit(-1.0), least(lit(1.0), x / sqrt(x * x + lit(15.0))))
    val sentiment = when(tb < 0 && vader <= -0.05, "negative")
      .when(tb > 0 && vader >= 0.05, "positive")
      .otherwise("neutral")
    val polarity = (tb + vader) / 2.0
    Seq(r4(tb).as("tb"), r4(vader).as("vader"),
      sentiment.as("sentiment"), r4(polarity).as("polarity"))
  }

  /** U3/U4: the ensemble vote with the OPTIONAL web scorer present
    * (reference `-w` flag, default off): when a web label exists, the
    * vote additionally requires its agreement —
    *   negative iff TB < 0 AND VADER <= -0.05 AND web == 'negative'
    *   positive iff TB > 0 AND VADER >= 0.05 AND web == 'positive'
    * (/root/reference/sentiment.py:493-506; the web call itself is an
    * external service and stays out of scope — callers supply the label
    * column, null = scorer off, reproducing the reference default). */
  def voteWithWeb(tb: Column, vader: Column, web: Column): Column =
    when(tb < 0 && vader <= -0.05 &&
      (web.isNull || web === "negative"), "negative")
      .when(tb > 0 && vader >= 0.05 &&
        (web.isNull || web === "positive"), "positive")
      .otherwise("neutral")

  /** T2 clean_text_sentiment: strip `[#|@]\S+` mentions/hashtags before
    * scoring (/root/reference/sentiment.py:424-428 — the reference's char
    * class contains a literal pipe, so tokens starting with '|' are
    * stripped too; reproduced verbatim for pipeline fidelity). */
  def cleanTextSentiment(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "[#|@]\\S+", ""), "\\s+", " "))

  /** Per-document ensemble scores (U1/U2/U4/U5). r8 shape: sort the
    * NARROW scan first, score after — a global sort's range-partitioning
    * samples its child, so scoring before the orderBy evaluated the full
    * VADER walk twice per doc (sampling pass + shuffle pass); projecting
    * after the Sort keeps one evaluation and the identical row order
    * (doc_id is a total key). A widen-then-score-then-sort variant
    * (compute on the map side of the sort exchange, parallel) was
    * measured SLOWER at bench scale — two extra 32-task stages cost
    * more than the serial scorer saves — and is documented in
    * OPTIMIZATION_r08.md as the rejected alternative. */
  def qSentimentDocs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .select(col("doc_id") +: scored(col("text")): _*)

  /** T2 as a registered operator: documents decorated with synthetic
    * mentions/hashtags (testdata has none — same trick as q34's URLs),
    * stripped, and re-scored: the strip changes token POSITIONS, which
    * moves negation windows — observable, oracle-verified behavior. */
  def qCleanSentiment(spark: SparkSession, dir: String): DataFrame = {
    val decorated = concat(lit("not @u1 #t2 @u3 "), col("text"),
      lit(" #tail_"), col("lang"))
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .orderBy("doc_id") // sort narrow first (see qSentimentDocs, r8)
      .select(col("doc_id") +:
        cleanTextSentiment(decorated).as("clean") +:
        scored(cleanTextSentiment(decorated)): _*)
      .select(col("doc_id"), length(col("clean")).cast("long").as("clean_len"),
        col("tb"), col("vader"), col("sentiment"))
  }

  /** Per-key state bound for qLinkMerge: only the most recent MergeWindow
    * events per key are collected (a window-rank filter BEFORE the
    * groupBy, so executor state is bounded even for a degenerate hot
    * key). The running (acc+x)/2 fold halves older contributions
    * exponentially — an event 256 steps back weighs 2^-256, far below
    * double precision — so the window is semantically lossless at any
    * realistic precision; the cap is still REPORTED per key
    * (n_events_used / n_events_total), never silent. */
  val MergeWindow = 256

  /** U6 link-sentiment merge: the reference folds per-link scores with a
    * running pairwise average acc=(acc+x)/2 — order-dependent, so the
    * fold runs over the (ts, event_id)-sorted value list exactly
    * (/root/reference/sentiment.py:201-222). Pure higher-order exprs,
    * bounded per-key state (MergeWindow). */
  def qLinkMerge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy("user_id")
    val recency = byKey.orderBy(desc("ts"), desc("event_id"))
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(recency))
      .withColumn("n_events_total", count(lit(1)).over(byKey))
      .where(col("rn") <= MergeWindow)
      .groupBy("user_id")
      .agg(
        expr(
          "sort_array(collect_list(named_struct('ts', ts, 'event_id', event_id, 'value', value)))")
          .as("ordered"),
        count(lit(1)).as("n_events_used"),
        max("n_events_total").as("n_events_total"))
      .select(col("user_id"),
        r4(expr(
          "aggregate(transform(ordered, o -> o.value), " +
          "named_struct('started', false, 'acc', cast(0.0 as double)), " +
          "(s, x) -> named_struct('started', true, " +
          "'acc', IF(s.started, (s.acc + x) / 2.0, x)), " +
          "s -> s.acc)")).as("merged"),
        col("n_events_used"), col("n_events_total"))
      .orderBy("user_id")
  }

  /** q28: the full VADER rule set exercised end-to-end against the SQL
    * oracle — the raw testdata is lowercase prose with no punctuation, so
    * each doc is deterministically decorated (by doc_id) with a prefix /
    * suffix that triggers one rule family: degree boosters + exclamation
    * amplification, ALL-CAPS + but-clause, the never-so intensifier, and
    * dampener + least + question marks. Same decoration in both engines;
    * hash-exact outputs prove every stage, not just the negation window. */
  def qVaderRules(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id") % 6
    val decorated =
      when(d === 0, concat(lit("really good "), col("text"), lit(" !!")))
        .when(d === 1, concat(lit("GOOD but bad "), col("text")))
        .when(d === 2, concat(lit("never so good "), col("text")))
        .when(d === 3, concat(lit("hardly good least slow "), col("text"), lit(" ???")))
        // 4: backward idiom threetwoone ("to die for" before the anchor)
        .when(d === 4, concat(lit("pad to die for good "), col("text")))
        // 5: two-token booster phrase + forward idiom zeroone at the tail
        .otherwise(concat(lit("pad sort of good "), col("text"), lit(" broken heart")))
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id") // sort narrow first (see qSentimentDocs, r8)
      .select(col("doc_id") +: scored(decorated): _*)
  }

  def vaderRulesOracle: String = {
    val decorated =
      """CASE WHEN doc_id % 6 = 0 THEN 'really good ' || text || ' !!'
        |     WHEN doc_id % 6 = 1 THEN 'GOOD but bad ' || text
        |     WHEN doc_id % 6 = 2 THEN 'never so good ' || text
        |     WHEN doc_id % 6 = 3 THEN 'hardly good least slow ' || text || ' ???'
        |     WHEN doc_id % 6 = 4 THEN 'pad to die for good ' || text
        |     ELSE 'pad sort of good ' || text || ' broken heart' END""".stripMargin
    s"""WITH ${scoredSql(s"docs AS (SELECT doc_id, $decorated AS text FROM documents)")}
       |$voteSql ORDER BY doc_id""".stripMargin
  }

  /** Dashboard rollup: terms agg over sentiment + avg/median polarity
    * (export.json:49,63 shape). */
  def qSentimentAgg(spark: SparkSession, dir: String): DataFrame =
    qSentimentDocs(spark, dir)
      .groupBy("sentiment")
      .agg(count(lit(1)).as("cnt"),
        r4(avg("polarity")).as("avg_polarity"),
        r4(min("polarity")).as("min_polarity"),
        r4(max("polarity")).as("max_polarity"))
      .orderBy("sentiment")

  // ---- DuckDB oracles (same lexicon/rule stages/fold order) ------------

  /** negated(): published NEGATE membership or the n't suffix. */
  private def negatedSql(e: String): String =
    s"($e IN ${Lexicon.duckNegatorsSql} OR $e LIKE '%n''t')"

  /** One (booster, negation-tree) stage at distance `d`, reading the
    * previous stage's `vs` list — the SQL twin of SentimentHelper's
    * distance loop. Guard per token: a value exists, the token `d` back
    * exists and is NOT itself a lexicon word. */
  private def stageSql(d: Int, prev: String, out: String): String = {
    val damp = d match {
      case 1 => ""
      case 2 => s" * $DampOne"
      case _ => s" * $DampTwo"
    }
    def w(back: Int) = s"wl[i+1-$back]" // token `back` positions before current
    val guardFail =
      s"vs[i+1] IS NULL OR i < $d OR m[${w(d)}][1] IS NOT NULL"
    val boosted =
      s"""CASE WHEN bm[${w(d)}][1] IS NULL THEN vs[i+1]
         |     ELSE vs[i+1] + ((CASE WHEN vs[i+1] < 0 THEN -bm[${w(d)}][1]
         |                           ELSE bm[${w(d)}][1] END)
         |       + (CASE WHEN iu[i+1-$d] AND cd
         |               THEN CASE WHEN vs[i+1] > 0 THEN $CapsIncr
         |                         ELSE ${-CapsIncr} END
         |               ELSE 0.0 END))$damp END""".stripMargin
    val never = d match {
      case 1 =>
        s"""CASE WHEN ${negatedSql(w(1))} THEN vb * $VaderNegScalar
           |     ELSE vb END""".stripMargin
      case 2 =>
        s"""CASE WHEN ${w(2)} = 'never' AND ${w(1)} IN ('so', 'this')
           |       THEN vb * $NeverScalar
           |     WHEN ${w(2)} = 'without' AND ${w(1)} = 'doubt' THEN vb
           |     WHEN ${negatedSql(w(2))} THEN vb * $VaderNegScalar
           |     ELSE vb END""".stripMargin
      case _ =>
        s"""CASE WHEN ${w(3)} = 'never' AND (${w(2)} IN ('so', 'this')
           |            OR ${w(1)} IN ('so', 'this')) THEN vb * $NeverScalar
           |     WHEN ${w(3)} = 'without' AND (${w(2)} = 'doubt'
           |            OR ${w(1)} = 'doubt') THEN vb
           |     WHEN ${negatedSql(w(3))} THEN vb * $VaderNegScalar
           |     ELSE vb END""".stripMargin
    }
    // _special_idioms_check twin (distance-3 pass only): backward 2/3-
    // gram sequences first-match-wins REPLACE vn (COALESCE order = the
    // published probe order, forward overrides strongest), then every
    // matching booster n-gram ADDS (+0.0 on a miss is bit-identical).
    val idiom = {
      val onezero = s"${w(1)} || ' ' || ${w(0)}"
      val twoone = s"${w(2)} || ' ' || ${w(1)}"
      val twoonezero = s"${w(2)} || ' ' || $onezero"
      val threetwo = s"${w(3)} || ' ' || ${w(2)}"
      val threetwoone = s"${w(3)} || ' ' || $twoone"
      s"""COALESCE(
         |  CASE WHEN i + 2 < len(wl)
         |       THEN im[${w(0)} || ' ' || wl[i+2] || ' ' || wl[i+3]][1] END,
         |  CASE WHEN i + 1 < len(wl)
         |       THEN im[${w(0)} || ' ' || wl[i+2]][1] END,
         |  im[$onezero][1], im[$twoonezero][1], im[$twoone][1],
         |  im[$threetwoone][1], im[$threetwo][1], vn)
         |+ COALESCE(bm[$threetwoone][1], 0.0)
         |+ COALESCE(bm[$threetwo][1], 0.0)
         |+ COALESCE(bm[$twoone][1], 0.0)""".stripMargin
    }
    val least =
      if (d < 3) "vn"
      else
        s"""CASE WHEN m[${w(1)}][1] IS NULL AND ${w(1)} = 'least'
           |          AND ${w(2)} <> 'at' AND ${w(2)} <> 'very'
           |       THEN vi * $VaderNegScalar
           |     ELSE vi END""".stripMargin
    // DuckDB lambdas have no let-bindings: thread vb/vn/vi through
    // 1-element list_transform hops (pure value plumbing, zero arithmetic)
    val inner =
      if (d < 3) s"list_transform([$never], vn -> $least)[1]"
      else
        s"""list_transform([$never], vn ->
           |  list_transform([$idiom], vi -> $least)[1])[1]""".stripMargin
    s"""$out AS (SELECT doc_id, wl, iu, cd, ep, qm,
       |  list_transform(range(len(wl)), i ->
       |    CASE WHEN $guardFail THEN vs[i+1]
       |         ELSE list_transform([$boosted], vb -> $inner)[1]
       |    END) AS vs
       |  FROM $prev, lex)""".stripMargin
  }

  /** The scoring pipeline as SQL over a CTE exposing docs(doc_id, text):
    * staged CTEs mirroring SentimentHelper stage-for-stage — strip/case
    * prep, base+caps, (boost+negation)×3 distances (+least), but-clause,
    * ordered sum + punctuation, compound. Every stage reads the previous
    * stage's value list exactly once, so the fp operation sequence is
    * identical to the native expression. */
  private def scoredSql(srcCte: String): String = {
    val punct = Lexicon.duckPunctSql
    s"""$srcCte,
       |lex AS (SELECT ${Lexicon.duckMapSql} AS m,
       |               ${Lexicon.duckBoosterMapSql} AS bm,
       |               ${Lexicon.duckIdiomMapSql} AS im),
       |tok AS (SELECT doc_id, text,
       |  list_filter(string_split(text, ' '), w -> length(w) >= 1) AS rt
       |  FROM docs),
       |prep AS (SELECT doc_id, text, rt,
       |  list_transform(rt, w -> CASE WHEN length(trim(w, $punct)) > 1
       |                               THEN trim(w, $punct) ELSE w END) AS st
       |  FROM tok),
       |feat AS (SELECT doc_id, text, rt,
       |  list_transform(st, s -> lower(s)) AS wl,
       |  list_transform(st, s -> upper(s) = s AND lower(s) <> s) AS iu
       |  FROM prep),
       |cdx AS (SELECT doc_id, wl, iu,
       |  len(list_filter(iu, b -> b)) > 0
       |    AND len(list_filter(iu, b -> b)) < len(iu) AS cd,
       |  length(text) - length(replace(text, '!', '')) AS ep,
       |  length(text) - length(replace(text, '?', '')) AS qm
       |  FROM feat),
       |sA AS (SELECT doc_id, wl, iu, cd, ep, qm,
       |  list_transform(range(len(wl)), i ->
       |    CASE WHEN m[wl[i+1]][1] IS NULL THEN NULL
       |         ELSE m[wl[i+1]][1] + CASE WHEN iu[i+1] AND cd
       |              THEN CASE WHEN m[wl[i+1]][1] > 0 THEN $CapsIncr
       |                        ELSE ${-CapsIncr} END
       |              ELSE 0.0 END END) AS vs
       |  FROM cdx, lex),
       |${stageSql(1, "sA", "s1")},
       |${stageSql(2, "s1", "s2")},
       |${stageSql(3, "s2", "s3")},
       |sBut AS (SELECT doc_id, wl, cd, ep, qm,
       |  list_transform(range(len(wl)), i ->
       |    CASE WHEN vs[i+1] IS NULL
       |           OR nullif(list_position(wl, 'but'), 0) IS NULL
       |           THEN vs[i+1]
       |         WHEN i+1 < list_position(wl, 'but') THEN vs[i+1] * $ButBefore
       |         WHEN i+1 > list_position(wl, 'but') THEN vs[i+1] * $ButAfter
       |         ELSE vs[i+1] END) AS vs
       |  FROM s3),
       |tbx AS (SELECT doc_id, wl, list_transform(range(len(wl)), i0 ->
       |  struct_pack(v := m[wl[i0 + 1]][1],
       |    neg := i0 > 0 AND len(list_filter(
       |      wl[greatest(1, i0 - ${NegWindow - 1}):i0],
       |      w -> ${negatedSql("w")})) > 0)) AS ts
       |  FROM cdx, lex),
       |sc AS (SELECT sBut.doc_id,
       |  CASE WHEN len(list_filter(ts, s -> s.v IS NOT NULL)) = 0 THEN 0.0
       |       ELSE list_reduce(list_transform(
       |              list_filter(ts, s -> s.v IS NOT NULL),
       |              s -> s.v / 4.0 * (CASE WHEN s.neg THEN $TbNegScalar ELSE 1.0 END)),
       |            (a, b) -> a + b)
       |            / len(list_filter(ts, s -> s.v IS NOT NULL)) END AS tb,
       |  CASE WHEN len(list_filter(vs, v -> v IS NOT NULL)) = 0 THEN 0.0
       |       ELSE list_reduce(list_filter(vs, v -> v IS NOT NULL),
       |            (a, b) -> a + b) END AS x0,
       |  least(ep, 4) * $ExclAmp +
       |    CASE WHEN qm > 1 THEN CASE WHEN qm <= 3 THEN qm * $QmAmpEach
       |                               ELSE $QmAmpCap END
       |         ELSE 0.0 END AS pe
       |  FROM sBut JOIN tbx ON sBut.doc_id = tbx.doc_id),
       |sx AS (SELECT doc_id, tb,
       |  CASE WHEN x0 > 0 THEN x0 + pe WHEN x0 < 0 THEN x0 - pe
       |       ELSE x0 END AS x FROM sc),
       |scored AS (SELECT doc_id, tb,
       |  greatest(-1.0, least(1.0, x / sqrt(x * x + 15.0))) AS vader
       |  FROM sx)""".stripMargin
  }

  private def voteSql: String =
    s"""SELECT doc_id, ${r4Sql("tb")} AS tb, ${r4Sql("vader")} AS vader,
       | CASE WHEN tb < 0 AND vader <= -0.05 THEN 'negative'
       |      WHEN tb > 0 AND vader >= 0.05 THEN 'positive'
       |      ELSE 'neutral' END AS sentiment,
       | ${r4Sql("(tb + vader) / 2.0")} AS polarity
       |FROM scored""".stripMargin

  def sentimentDocsOracle: String =
    s"""WITH ${scoredSql("docs AS (SELECT doc_id, text FROM documents)")}
       |$voteSql ORDER BY doc_id""".stripMargin

  def sentimentAggOracle: String =
    s"""SELECT sentiment, count(*) AS cnt,
       | ${r4Sql("avg(polarity)")} AS avg_polarity,
       | ${r4Sql("min(polarity)")} AS min_polarity,
       | ${r4Sql("max(polarity)")} AS max_polarity
       |FROM ($sentimentDocsOracle) GROUP BY sentiment ORDER BY sentiment""".stripMargin

  def cleanSentimentOracle: String = {
    val decorated = "'not @u1 #t2 @u3 ' || text || ' #tail_' || lang"
    val cleaned =
      s"trim(regexp_replace(regexp_replace($decorated, '[#|@]\\S+', '', 'g'), '\\s+', ' ', 'g'))"
    val srcCte =
      s"""docs AS (SELECT doc_id, $cleaned AS text FROM documents),
         |clens AS (SELECT doc_id, length(text) AS clean_len FROM docs)""".stripMargin
    s"""WITH ${scoredSql(srcCte)}
       |SELECT scored.doc_id, clens.clean_len, ${r4Sql("tb")} AS tb,
       |       ${r4Sql("vader")} AS vader,
       | CASE WHEN tb < 0 AND vader <= -0.05 THEN 'negative'
       |      WHEN tb > 0 AND vader >= 0.05 THEN 'positive'
       |      ELSE 'neutral' END AS sentiment
       |FROM scored JOIN clens ON scored.doc_id = clens.doc_id
       |ORDER BY scored.doc_id""".stripMargin
  }
}

package graft

import graft.analyze.CodeAnalyzer
import graft.functions.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** The code_tokenize Catalyst expression: SQL parity with the frozen
  * CodeAnalyzer semantics, and it must stay inside whole-stage codegen. */
class FunctionSpec extends AnyFunSuite with SparkSessionFixture {

  test("code_tokenize in SQL == CodeAnalyzer.analyze (incl. camelCase paths)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val inputs = Seq(
      "def computeHashValue(inputBuffer, 42):",
      "HTTPServerConfig block_max_score the a of",
      "plain lowercase words here",
      "foo2Bar __init__ x",
      "")
    inputs.toDF("s").createOrReplaceTempView("fn_in")
    val got = spark.sql("SELECT code_tokenize(s) FROM fn_in")
      .collect().map(_.getSeq[String](0).toSeq)
    got.zip(inputs).foreach { case (g, in) =>
      assert(g === CodeAnalyzer.analyze(in), s"input '$in'")
    }
  }

  test("code_tokenize runs inside whole-stage codegen (file scan, not folded)") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("fn_docs")
    val df = spark.sql(
      "SELECT sum(size(code_tokenize(text))) AS n FROM fn_docs")
    val n = df.collect().head.getLong(0)
    assert(n > 1000L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"expected codegen span:\n$p")
    // the expression itself must appear inside the codegen'd project
    assert(p.contains("code_tokenize"), p)
  }

  test("PortableHash.hex60 matches the DuckDB hex-cast goldens") {
    // pinned from DuckDB 1.0: ('0x' || substr(md5(s),1,15))::BIGINT —
    // the seam every dedup/ANN oracle depends on
    assert(graft.functions.PortableHash.hex60("abc") === 648541476951500027L)
    assert(graft.functions.PortableHash.hex60("hello world") === 426544247714475757L)
    assert(graft.functions.PortableHash.hex60("spark query join") === 138757416094915521L)
    assert(graft.functions.PortableHash.hex60("") === 955282973525019424L)
    // and the Spark-SQL built-in formulation agrees (what shingleKeys uses)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Seq("abc", "hello world", "spark query join", "")
      .toDF("s")
      .select(conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(648541476951500027L, 426544247714475757L,
      138757416094915521L, 955282973525019424L))
  }

  test("native expressions run inside codegen and agree with helpers") {
    import spark.implicits._
    graft.functions.MinHashFunctions.register(spark)
    graft.functions.HashEmbedFunctions.register(spark)
    graft.functions.SentimentFunctions.register(spark)
    Seq(Seq("fast", "merge", "join", "not", "slow"))
      .toDF("tk").createOrReplaceTempView("fn_tk")
    val row = spark.sql(
      """SELECT size(minhash_sig(tk)) AS nsig, simhash64(tk) AS sh,
        |       size(hash_embed(tk)) AS dim, sentiment_score(tk) AS sc
        |FROM fn_tk""".stripMargin).collect().head
    // empty token array: every expression must survive (whitespace-only
    // docs exist in the wild); minhash's whole-doc shingle degrades to ''
    val empty = spark.sql(
      """SELECT minhash_sig(e) AS sig, simhash64(e) AS sh,
        |       size(hash_embed(e)) AS dim, sentiment_score(e) AS sc
        |FROM (SELECT CAST(array() AS array<string>) AS e)""".stripMargin)
      .collect().head
    assert(empty.getSeq[Long](0).length === 64)
    assert(empty.getAs[Long]("sh") === 0L)
    assert(empty.getAs[Int]("dim") === 64)
    // the empty-doc shingle key equals hex60(md5('')) — oracle parity
    val p = graft.functions.PortableHash
    val expectedFirst = (p.SeedA(0) * (p.hex60("") % p.P) + p.SeedB(0)) % p.P
    assert(empty.getSeq[Long](0).head === expectedFirst)
    assert(row.getAs[Int]("nsig") === 64)
    assert(row.getAs[Int]("dim") === 64)
    // 'slow' (-1.8) negated by 'not' one position back: x = -1.8 * -0.74
    // plus un-negated 'fast' (+1.8): x = 1.8 + 1.332
    val sc = row.getStruct(3)
    assert(math.abs(sc.getDouble(1) - (1.8 + 1.8 * 0.74)) < 1e-12)
    assert(row.getAs[Long]("sh") === graft.functions.SimHashHelper.simhash(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Seq("fast", "merge", "join", "not", "slow")
          .map(org.apache.spark.unsafe.types.UTF8String.fromString))))
  }

  test("VADER rule goldens: caps, boosters, damping, never-so, but, least, punctuation") {
    import graft.ops.Lexicon._
    def x(tokens: String*): Double =
      graft.functions.SentimentHelper.score(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          tokens.map(org.apache.spark.unsafe.types.UTF8String.fromString)))
        .getDouble(1)
    def close(a: Double, b: Double): Unit =
      assert(math.abs(a - b) < 1e-12, s"$a vs $b")
    val good = 1.9 // lexicon value used by the goldens
    val bad = -2.5

    close(x("good"), good)
    close(x("not", "good"), good * VaderNegScalar)
    close(x("hasn't", "been", "good"), good * VaderNegScalar) // n't + distance 2
    close(x("very", "good"), good + BoostIncr) // booster, no damping at d=1
    close(x("very", "very", "good"),
      good + BoostIncr + BoostIncr * DampOne) // second booster damped 0.95
    close(x("so", "so", "so", "good"),
      good + BoostIncr + BoostIncr * DampOne + BoostIncr * DampTwo)
    close(x("hardly", "good"), good + BoostDecr) // dampener
    // ALL-CAPS sentiment word on a cap-differential text
    close(x("GOOD", "stuff"), good + CapsIncr)
    // ALL-CAPS booster bumps its scalar by C_INCR
    close(x("VERY", "good"), good + (BoostIncr + CapsIncr))
    // all-caps text => NO cap differential => no emphasis
    close(x("GOOD", "STUFF"), good)
    // never so/this intensifier (d=2), after the d=1 "so" booster
    close(x("never", "so", "good"), (good + BoostIncr) * NeverScalar)
    // without-doubt exemption: "good" passes through untouched at d=2
    // ("doubt" is itself lexicon-valenced at -1.5 and negated by
    // "without" at d=1 — both effects in one sum)
    close(x("without", "doubt", "good"), -1.5 * VaderNegScalar + good)
    // plain negator at d=3
    close(x("not", "the", "same", "good"), good * VaderNegScalar)
    // but-clause: before *0.5, after *1.5
    close(x("good", "but", "bad"), good * ButBefore + bad * ButAfter)
    // least check (runs in the d=3 pass, so needs i >= 3):
    // "was least slow" damps, the "at least" idiom is exempt
    close(x("it", "was", "least", "slow"), -1.8 * VaderNegScalar)
    close(x("it", "at", "least", "slow"), -1.8)
  }

  test("VADER punctuation amplification goldens") {
    import graft.ops.Lexicon._
    def x(tokens: String*): Double =
      graft.functions.SentimentHelper.score(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          tokens.map(org.apache.spark.unsafe.types.UTF8String.fromString)))
        .getDouble(1)
    def close(a: Double, b: Double): Unit =
      assert(math.abs(a - b) < 1e-12, s"$a vs $b")
    close(x("good!"), 1.9 + ExclAmp) // strip keeps the word, '!' counted
    close(x("good", "!!"), 1.9 + 2 * ExclAmp)
    close(x("good", "!!!!!"), 1.9 + 4 * ExclAmp) // capped at 4
    close(x("bad", "!!"), -2.5 - 2 * ExclAmp) // sign-matched
    close(x("good", "??"), 1.9 + 2 * QmAmpEach)
    close(x("good", "????"), 1.9 + QmAmpCap)
    close(x("good", "?"), 1.9) // single '?' does not amplify
  }

  test("parseVecLiteral: empty components fail loudly, never shift") {
    import graft.ops.{AnnIndex, AnnOps}
    val good = (0 until AnnIndex.Dim).map(i => (i % 7 - 3) / 7.0)
    assert(AnnOps.parseVecLiteral(good.mkString(",")).toSeq == good)
    // Dim+1 slots with ONE empty: dropping the empty would pass the
    // length check with every later component misaligned — must throw
    val shifted = (good :+ 0.5).updated(3, "")
    val e1 = intercept[IllegalArgumentException] {
      AnnOps.parseVecLiteral(shifted.mkString(","))
    }
    assert(e1.getMessage.contains("empty component"), e1.getMessage)
    // a trailing separator is an empty component too (strict contract)
    val e2 = intercept[IllegalArgumentException] {
      AnnOps.parseVecLiteral(good.mkString(",") + ",")
    }
    assert(e2.getMessage.contains("empty component"), e2.getMessage)
    // non-numeric and wrong-arity stay loud
    intercept[IllegalArgumentException] {
      AnnOps.parseVecLiteral(good.updated(0, "abc").mkString(","))
    }
    intercept[IllegalArgumentException] {
      AnnOps.parseVecLiteral(good.take(AnnIndex.Dim - 1).mkString(","))
    }
  }

  test("null-safety through the expression") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(Some("abc def"), None).toDF("s").createOrReplaceTempView("fn_in3")
    val rows = spark.sql("SELECT code_tokenize(s) FROM fn_in3").collect()
    assert(rows(0).getSeq[String](0) === Seq("abc", "def"))
    assert(rows(1).isNullAt(0))
  }
}

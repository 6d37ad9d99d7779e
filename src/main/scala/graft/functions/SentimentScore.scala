package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The U1/U2 lexicon scorers as ONE native pass over the RAW (original-
  * case) token array, returning struct(tb, x):
  *
  *   tb = TextBlob-shape mean of matched base valences/4 (simple 3-token
  *        negation window scaling by -0.5 — the documented TextBlob-style
  *        simplification);
  *   x  = the full published VADER valence sum BEFORE compound
  *        normalization: token strip (leading/trailing punctuation),
  *        ALL-CAPS emphasis on cap-differential texts, degree modifiers
  *        with 0.95/0.9 distance damping and the lexicon-word skip, the
  *        negation decision tree (N_SCALAR, never-so/this, without-doubt,
  *        n't suffix), the least check, the but-clause re-weighting, and
  *        exclamation/question amplification. The x/sqrt(x²+15) compound
  *        step (with its [-1,1] clamp) stays a visible column expression.
  *
  * Exists because the pure column formulation (per-index element_at over
  * a projected token array, a lookback window per index) re-evaluates the
  * tokenize subtree inside every lambda use (CollapseProject inlining) —
  * O(n^3) char work per document, measured 9.9 s for 500 docs at bench.
  * Every branch and every fp operation runs in a FROZEN order mirrored
  * exactly by the generated DuckDB oracle (SentimentOps.scoredSql):
  * stage order base+caps -> (boost, never)×3 distances -> least -> but ->
  * ordered sum -> punctuation.
  */
object SentimentHelper {
  import graft.ops.Lexicon

  private val lex: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    Lexicon.Entries.foreach { case (w, v) => m.put(w, v) }
    m
  }
  private val boosters: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    Lexicon.Boosters.foreach { case (w, v) => m.put(w, v) }
    m
  }
  private val idioms: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    Lexicon.SpecialCases.foreach { case (w, v) => m.put(w, v) }
    m
  }
  private val negators: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Lexicon.Negators.foreach(s.add)
    s
  }
  private val punct: java.util.HashSet[Character] = {
    val s = new java.util.HashSet[Character]()
    Lexicon.PunctChars.foreach(c => s.add(c))
    s
  }

  /** _strip_punc_if_word: strip leading/trailing punctuation, keep the
    * original token when at most one char would remain. */
  def strip(w: String): String = {
    var a = 0
    var b = w.length
    while (a < b && punct.contains(w.charAt(a))) a += 1
    while (b > a && punct.contains(w.charAt(b - 1))) b -= 1
    val t = w.substring(a, b)
    if (t.length > 1) t else w
  }

  /** str.isupper analogue matching the SQL twin:
    * upper(s) = s AND lower(s) <> s. */
  def isUp(s: String): Boolean = s.toUpperCase == s && s.toLowerCase != s

  def negated(wl: String): Boolean =
    negators.contains(wl) || wl.endsWith("n't")

  /** (tb, x) for a raw token array. */
  def score(tokens: ArrayData): InternalRow = {
    import Lexicon._
    val n = tokens.numElements()
    if (n == 0) return InternalRow(0.0, 0.0)
    val raw = new Array[String](n)
    val wl = new Array[String](n)
    val iu = new Array[Boolean](n)
    val inLex = new Array[Boolean](n)
    var ep = 0
    var qm = 0
    var i = 0
    while (i < n) {
      raw(i) = tokens.getUTF8String(i).toString
      val st = strip(raw(i))
      wl(i) = st.toLowerCase
      iu(i) = isUp(st)
      inLex(i) = lex.containsKey(wl(i))
      var c = 0
      while (c < raw(i).length) {
        val ch = raw(i).charAt(c)
        if (ch == '!') ep += 1 else if (ch == '?') qm += 1
        c += 1
      }
      i += 1
    }
    var nUp = 0
    i = 0
    while (i < n) { if (iu(i)) nUp += 1; i += 1 }
    val capDiff = nUp > 0 && nUp < n

    // stage A: base valence + ALL-CAPS emphasis
    val vs = new Array[Double](n)
    val hit = inLex.clone()
    i = 0
    while (i < n) {
      if (hit(i)) {
        var v = lex.get(wl(i)).doubleValue()
        if (iu(i) && capDiff) v = v + (if (v > 0) CapsIncr else -CapsIncr)
        vs(i) = v
      }
      i += 1
    }

    // stages (boost, never)×distance + least — guard per (i, d):
    // the token d back exists and is NOT itself a lexicon word
    var d = 1
    while (d <= 3) {
      i = 0
      while (i < n) {
        if (hit(i) && i >= d && !inLex(i - d)) {
          var v = vs(i)
          // booster (degree modifier), sign-matched, caps-bumped, damped
          val b = boosters.get(wl(i - d))
          if (b != null) {
            val b1 = if (v < 0) -b.doubleValue() else b.doubleValue()
            val b2 =
              if (iu(i - d) && capDiff) {
                if (v > 0) b1 + CapsIncr else b1 - CapsIncr
              } else b1
            val s = d match {
              case 1 => b2
              case 2 => b2 * DampOne
              case _ => b2 * DampTwo
            }
            v = v + s
          }
          // negation decision tree (published _never_check)
          d match {
            case 1 =>
              if (negated(wl(i - 1))) v = v * VaderNegScalar
            case 2 =>
              if (wl(i - 2) == "never" &&
                  (wl(i - 1) == "so" || wl(i - 1) == "this")) v = v * NeverScalar
              else if (wl(i - 2) == "without" && wl(i - 1) == "doubt") ()
              else if (negated(wl(i - 2))) v = v * VaderNegScalar
            case _ =>
              if (wl(i - 3) == "never" &&
                  (wl(i - 2) == "so" || wl(i - 2) == "this" ||
                   wl(i - 1) == "so" || wl(i - 1) == "this")) v = v * NeverScalar
              else if (wl(i - 3) == "without" &&
                       (wl(i - 2) == "doubt" || wl(i - 1) == "doubt")) ()
              else if (negated(wl(i - 3))) v = v * VaderNegScalar
          }
          if (d == 3) {
            // _special_idioms_check (published: runs at start_i == 2,
            // after the negation check). Backward sequences first-match-
            // wins REPLACE the valence; the forward zeroone/zeroonetwo
            // probes then override; booster n-grams ADD (every match).
            val onezero = wl(i - 1) + " " + wl(i)
            val twoone = wl(i - 2) + " " + wl(i - 1)
            val twoonezero = wl(i - 2) + " " + onezero
            val threetwo = wl(i - 3) + " " + wl(i - 2)
            val threetwoone = wl(i - 3) + " " + twoone
            val seqs = Array(onezero, twoonezero, twoone, threetwoone, threetwo)
            var k = 0
            var matched = false
            while (k < seqs.length && !matched) {
              val sv = idioms.get(seqs(k))
              if (sv != null) { v = sv.doubleValue(); matched = true }
              k += 1
            }
            if (i + 1 < n) {
              val sv = idioms.get(wl(i) + " " + wl(i + 1))
              if (sv != null) v = sv.doubleValue()
            }
            if (i + 2 < n) {
              val sv = idioms.get(wl(i) + " " + wl(i + 1) + " " + wl(i + 2))
              if (sv != null) v = sv.doubleValue()
            }
            var g = 0
            val grams = Array(threetwoone, threetwo, twoone)
            while (g < grams.length) {
              val bv = boosters.get(grams(g))
              if (bv != null) v = v + bv.doubleValue()
              g += 1
            }
            // least check (published: inside the distance-3 pass, so the
            // enclosing i >= 3 guard makes the published i == 1 clause
            // unreachable — intentionally NOT carried here or in the SQL
            // twin, which must stay expression-identical)
            if (!inLex(i - 1) && wl(i - 1) == "least" &&
                wl(i - 2) != "at" && wl(i - 2) != "very") v = v * VaderNegScalar
          }
          vs(i) = v
        }
        i += 1
      }
      d += 1
    }

    // but-clause re-weighting (first "but", case-insensitive)
    var bi = -1
    i = 0
    while (i < n && bi < 0) { if (wl(i) == "but") bi = i; i += 1 }
    if (bi >= 0) {
      i = 0
      while (i < n) {
        if (hit(i)) {
          if (i < bi) vs(i) = vs(i) * ButBefore
          else if (i > bi) vs(i) = vs(i) * ButAfter
        }
        i += 1
      }
    }

    // ordered sum, then punctuation emphasis (sign-matched)
    var x = 0.0
    i = 0
    while (i < n) { if (hit(i)) x += vs(i); i += 1 }
    val pe = math.min(ep, 4) * ExclAmp +
      (if (qm > 1) { if (qm <= 3) qm * QmAmpEach else QmAmpCap } else 0.0)
    if (x > 0) x = x + pe else if (x < 0) x = x - pe

    // TextBlob-shape mean over matched BASE valences (no caps/boosters)
    var tbSum = 0.0
    var tbCnt = 0
    i = 0
    while (i < n) {
      if (inLex(i)) {
        var neg = false
        var j = math.max(0, i - NegWindow)
        while (j < i && !neg) { if (negated(wl(j))) neg = true; j += 1 }
        tbSum += lex.get(wl(i)).doubleValue() / 4.0 *
          (if (neg) TbNegScalar else 1.0)
        tbCnt += 1
      }
      i += 1
    }
    val tb = if (tbCnt == 0) 0.0 else tbSum / tbCnt
    InternalRow(tb, x)
  }
}

case class SentimentScore(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("tb", DoubleType, nullable = false),
    StructField("x", DoubleType, nullable = false)))
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"sentiment_score needs array<string>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    SentimentHelper.score(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SentimentHelper.score($c)")
  override protected def withNewChildInternal(newChild: Expression): SentimentScore =
    copy(child = newChild)
  override def prettyName: String = "sentiment_score"
}

object SentimentFunctions {
  def register(spark: SparkSession): Unit = {
    val info = new ExpressionInfo(classOf[SentimentScore].getName, null,
      "sentiment_score",
      "sentiment_score(array<string>) - struct(tb, x) lexicon sentiment", "")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sentiment_score"), info,
      (exprs: Seq[Expression]) => SentimentScore(exprs.head))
  }
}

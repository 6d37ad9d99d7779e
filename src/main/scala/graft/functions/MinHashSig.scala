package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-pass 64-slot MinHash over word 3-gram shingles of a token array,
  * on the PORTABLE hash scheme (graft.functions.PortableHash): shingle
  * key = md5-hex60 of the space-joined 3 tokens, slot i = min over
  * shingles of (a_i*key + b_i) mod (2^31-1) — bit-identical to the DuckDB
  * oracle SQL. A native expression because the pure `aggregate`/`zip_with`
  * formulation allocates a 64-element array per shingle (measured
  * ~80x slower at sf0.1) and CollapseProject would re-evaluate a projected
  * shingle array once per lambda use; here everything is one tight loop. */
object MinHashHelper {
  import PortableHash.{NumHashes, P, SeedA, SeedB}

  val ShingleSize = 3

  /** Build the j-th shingle string "tok_j tok_j+1 tok_j+2" as UTF-8.
    * w == 0 (empty token array) yields the empty string — the oracle's
    * array_to_string([], ' ') — instead of a negative allocation. */
  @inline private def shingleBytes(toks: Array[Array[Byte]], j: Int, w: Int): Array[Byte] = {
    var len = math.max(0, w - 1)
    var i = 0
    while (i < w) { len += toks(j + i).length; i += 1 }
    val out = new Array[Byte](len)
    var pos = 0
    i = 0
    while (i < w) {
      val t = toks(j + i)
      System.arraycopy(t, 0, out, pos, t.length)
      pos += t.length
      if (i < w - 1) { out(pos) = ' '; pos += 1 }
      i += 1
    }
    out
  }

  def sig(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { tb(i) = tokens.getUTF8String(i).getBytes; i += 1 }
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    @inline def absorb(key60: Long): Unit = {
      val x = key60 % P
      var k = 0
      while (k < NumHashes) {
        val v = (SeedA(k) * x + SeedB(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
    }
    if (n >= ShingleSize) {
      var j = 0
      while (j + ShingleSize - 1 < n) {
        absorb(PortableHash.hex60(shingleBytes(tb, j, ShingleSize)))
        j += 1
      }
    } else {
      // short doc: a single whole-doc shingle (all tokens space-joined)
      absorb(PortableHash.hex60(shingleBytes(tb, 0, n)))
    }
    new GenericArrayData(mins)
  }
}

/** Portable tf-weighted 60-bit SimHash of a token array: token hash =
  * md5-hex60; bit b is set iff tokens-with-bit-b (counted WITH
  * multiplicity — that is the tf weighting) are a strict majority.
  * Reproducible in DuckDB with shift/mask arithmetic over the same md5
  * base hash. */
object SimHashHelper {
  import PortableHash.SimHashBits

  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    if (n == 0) return 0L
    val counts = new Array[Int](SimHashBits)
    var i = 0
    while (i < n) {
      val h = PortableHash.hex60(tokens.getUTF8String(i).getBytes)
      var b = 0
      while (b < SimHashBits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < SimHashBits) {
      if (2 * counts(b) > n) out |= (1L << b)
      b += 1
    }
    out
  }
}

case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"minhash_sig needs array<string>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    MinHashHelper.sig(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashHelper.sig($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"simhash64 needs array<string>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    SimHashHelper.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashHelper.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object MinHashFunctions {
  def register(spark: SparkSession): Unit = {
    val info = new ExpressionInfo(classOf[MinHashSig].getName, null,
      "minhash_sig", "minhash_sig(array<string>) - 64-slot MinHash signature", "")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sig"), info,
      (exprs: Seq[Expression]) => MinHashSig(exprs.head))
    val info2 = new ExpressionInfo(classOf[SimHash64].getName, null,
      "simhash64", "simhash64(array<string>) - 60-bit tf-weighted SimHash", "")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash64"), info2,
      (exprs: Seq[Expression]) => SimHash64(exprs.head))
  }
}

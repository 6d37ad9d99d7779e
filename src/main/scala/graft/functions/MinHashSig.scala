package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-pass 64-slot MinHash over word 3-gram shingles of a token array.
  * The pure-`aggregate`/`zip_with` formulation allocates a 64-element
  * array per shingle (measured ~4 ms/doc at 5k docs); this native
  * expression is a tight primitive loop (~50 us/doc), the justified
  * "graduate the hot scalar to a codegen Expression" case. */
object MinHashHelper {
  val NumHashes = 64
  val ShingleSize = 3

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val seeds: Array[Long] = Array.tabulate(NumHashes)(i => mix(1337L * (i + 1)))

  /** FNV-1a 64 over UTF-8 bytes. */
  @inline private def fnv(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
    h
  }

  def sig(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = fnv(tokens.getUTF8String(i)); i += 1 }
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    @inline def absorb(s: Long): Unit = {
      var k = 0
      while (k < NumHashes) {
        val v = mix(s ^ seeds(k))
        if (v < mins(k)) mins(k) = v
        k += 1
      }
    }
    if (n >= ShingleSize) {
      var j = 0
      while (j + ShingleSize - 1 < n) {
        absorb(mix(mix(th(j)) ^ mix(th(j + 1) + 0x1b873593L) ^ (th(j + 2) * 0xcc9e2d51L)))
        j += 1
      }
    } else {
      // short doc: one whole-doc shingle (chain the token hashes)
      var s = 0x51ed270bL
      var j = 0
      while (j < n) { s = mix(s ^ th(j)); j += 1 }
      absorb(s)
    }
    new GenericArrayData(mins)
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

object MinHashFunctions {
  def register(spark: SparkSession): Unit = {
    val info = new ExpressionInfo(classOf[MinHashSig].getName, null,
      "minhash_sig", "minhash_sig(array<string>) - 64-slot MinHash signature", "")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sig"), info,
      (exprs: Seq[Expression]) => MinHashSig(exprs.head))
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Hashing-vectorizer document embedding: a 64-dim token-count histogram
  * where token t lands in dimension md5hex60(t) % 64 (the classic
  * feature-hashing trick, Weinberger et al. 2009), counts with
  * multiplicity, unnormalized (cosine normalizes downstream). On the
  * portable hash, so DuckDB reproduces the vectors exactly. One tight
  * pass per row (native, not lambdas — CollapseProject would re-evaluate
  * the tokenize per dimension). */
object HashEmbedHelper {
  val Dim = 64

  def embed(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val v = new Array[Double](Dim)
    var i = 0
    while (i < n) {
      val h = PortableHash.hex60(tokens.getUTF8String(i).getBytes)
      v((h % Dim).toInt) += 1.0
      i += 1
    }
    new GenericArrayData(v)
  }
}

case class HashEmbed(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"hash_embed needs array<string>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    HashEmbedHelper.embed(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashEmbedHelper.embed($c)")
  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
  override def prettyName: String = "hash_embed"
}

object HashEmbedFunctions {
  def register(spark: SparkSession): Unit = {
    val info = new ExpressionInfo(classOf[HashEmbed].getName, null,
      "hash_embed", "hash_embed(array<string>) - 64-dim hashed count vector", "")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("hash_embed"), info,
      (exprs: Seq[Expression]) => HashEmbed(exprs.head))
  }
}

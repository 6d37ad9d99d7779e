package graft.functions

import graft.analyze.CodeAnalyzer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-callable bridge: UTF8String in, ArrayData of tokens out.
  * Kept as a bare object (no companion class) so the generated code can
  * call the static forwarder. */
object CodeTokenizeHelper {
  def tokenize(s: UTF8String): ArrayData = {
    val toks = CodeAnalyzer.analyze(if (s == null) null else s.toString)
    new GenericArrayData(toks.map(t => UTF8String.fromString(t)).toArray[Any])
  }
}

/**
 * The code-aware analyzer as a native Catalyst expression (SURVEY.md
 * §2.10: the one hot-path scalar worth graduating from a plain Scala
 * function to a codegen'd Expression). `doGenCode` emits a direct static
 * call, so the tokenizer stays inside whole-stage codegen instead of
 * breaking the stage the way a Scala UDF would.
 *
 * SQL: `code_tokenize(content)` -> array<string> with the frozen
 * CodeAnalyzer semantics (camelCase/snake_case splits, preserve-original,
 * stopwords, min length — AnalyzerSpec goldens).
 */
case class CodeTokenize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CodeTokenizeHelper.tokenize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodeTokenizeHelper.tokenize($c)")
  override protected def withNewChildInternal(newChild: Expression): CodeTokenize =
    copy(child = newChild)
  override def prettyName: String = "code_tokenize"
}

/** SQL registration; Column-DSL use goes through `expr("code_tokenize(x)")`
  * after register() (Spark 4 made Column construction node-based). */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val info = new ExpressionInfo(classOf[CodeTokenize].getName, null,
      "code_tokenize", "code_tokenize(str) - code-aware analyzer token array", "")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("code_tokenize"), info,
      (exprs: Seq[Expression]) => CodeTokenize(exprs.head))
  }
}

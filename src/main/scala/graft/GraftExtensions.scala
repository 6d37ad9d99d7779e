package graft

import graft.functions.{CodeTokenize, MinHashSig}
import graft.plans.{AnnTvf, MatchFilter, MatchFilterRewrite, MatchStrategy, MatchTvf}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session wiring for the engine's Catalyst extensions:
  *   spark.sql.extensions=graft.GraftExtensions
  * injects the MatchTopK planner strategy, the match_topk(...) SQL
  * table-valued function, and the native expressions (code_tokenize,
  * minhash_sig) into every session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => MatchStrategy)
    e.injectTableFunction((
      FunctionIdentifier("match_topk"),
      new ExpressionInfo(MatchTvf.getClass.getName, null, "match_topk",
        MatchTvf.usage, ""),
      (exprs: Seq[Expression]) => MatchTvf.build(exprs)))
    e.injectTableFunction((
      FunctionIdentifier("explain_score"),
      new ExpressionInfo(MatchTvf.getClass.getName, null, "explain_score",
        MatchTvf.explainUsage, ""),
      (exprs: Seq[Expression]) => MatchTvf.buildExplain(exprs)))
    e.injectTableFunction((
      FunctionIdentifier("highlight"),
      new ExpressionInfo(MatchTvf.getClass.getName, null, "highlight",
        MatchTvf.highlightUsage, ""),
      (exprs: Seq[Expression]) => MatchTvf.buildHighlight(exprs)))
    e.injectTableFunction((
      FunctionIdentifier("ann_topk"),
      new ExpressionInfo(AnnTvf.getClass.getName, null, "ann_topk",
        AnnTvf.usage, ""),
      (exprs: Seq[Expression]) => AnnTvf.build(exprs)))
    e.injectFunction((
      FunctionIdentifier("match"),
      new ExpressionInfo(classOf[MatchFilter].getName, null, "match",
        "match(content, query) - boolean keyword filter (spaces AND, " +
          "commas OR); index-rewritten over documents tables", ""),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "match(content, query) takes 2 arguments")
        MatchFilter(exprs(0), exprs(1))
      }))
    e.injectOptimizerRule(_ => MatchFilterRewrite)
    e.injectFunction((
      FunctionIdentifier("code_tokenize"),
      new ExpressionInfo(classOf[CodeTokenize].getName, null, "code_tokenize",
        "code_tokenize(str) - code-aware analyzer token array", ""),
      (exprs: Seq[Expression]) => CodeTokenize(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, null, "minhash_sig",
        "minhash_sig(array<string>) - 64-slot MinHash signature", ""),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head)))
  }
}

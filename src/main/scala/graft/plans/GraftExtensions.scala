package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql` users get them
  * too (SURVEY.md §4.3).
  *
  * Cluster deploys attach it with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`; local code
  * can call [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => RewriteSelfDotToNorm2)
  }
}

object GraftExtensions {

  private def intLit(e: Expression): Int =
    e.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
      .value.asInstanceOf[Number].intValue()

  /** SQL name → expression builder for every custom expression the engine
    * ships. Static arguments (permutation counts, band widths…) are passed
    * as integer literals. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product_float" -> ((exprs: Seq[Expression]) => DotProductFloat(exprs(0), exprs(1))),
    "simhash64" -> ((exprs: Seq[Expression]) => SimHash64Expr(exprs(0))),
    "minhash_sig" -> ((exprs: Seq[Expression]) =>
      MinHashSigExpr(exprs(0), intLit(exprs(1)), intLit(exprs(2)))),
    "winnow_fingerprints" -> ((exprs: Seq[Expression]) =>
      WinnowFingerprintExpr(exprs(0), intLit(exprs(1)), intLit(exprs(2)))),
    "srp_sketch" -> ((exprs: Seq[Expression]) =>
      SrpSketchExpr(exprs(0), intLit(exprs(1)), intLit(exprs(2)))),
    "approx_top_k" -> ((exprs: Seq[Expression]) =>
      SpaceSavingAgg(exprs(0), intLit(exprs(1)), intLit(exprs(2))).toAggregateExpression()),
    "minhash_merge" -> ((exprs: Seq[Expression]) =>
      MinHashMergeAgg(exprs(0), intLit(exprs(1))).toAggregateExpression())
  )

  /** Imperative registration for an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

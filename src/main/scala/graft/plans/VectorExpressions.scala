package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Custom Catalyst expression (SURVEY.md §2.10 `expr_custom`, §4.3):
  * fused dot product over two `ARRAY<FLOAT>` columns with whole-stage
  * codegen.
  *
  * Why it exists: the composable form (`zip_with` + `aggregate`) is
  * correct but higher-order functions evaluate *interpreted* — per-element
  * lambda dispatch and boxing. On the all-pairs similarity join that is
  * millions of 64-float dots and dominated the bench. `doGenCode` emits a
  * tight primitive loop (`getFloat(i)` — no allocation, no boxing) that
  * Janino fuses into the surrounding stage, restoring
  * WholeStageCodegen across the whole similarity pipeline.
  *
  * Semantics match the HOF version bit-for-bit: left-to-right summation
  * in DOUBLE; any null element or null array yields NULL (mirrors
  * `zip_with` null propagation). Arrays of unequal length yield NULL —
  * `zip_with` pads the shorter side with nulls, and null · x is null, so
  * the HOF form's sum is NULL there too.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_float"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** norm2_float(v) = Σ v(i)² in DOUBLE — the single-child specialization
  * of `dot_product_float(v, v)`. Same fold order and null semantics as
  * [[DotProductFloat]] with both sides equal; evaluates the child ONCE
  * (the binary form evaluates its two identical subtrees separately).
  * Produced by [[graft.plans.RewriteSelfDotToNorm2]]. */
case class Norm2Float(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm2_float"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = (double) $a.getFloat($i);
         |  $acc += $x * $x;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Tiny broadcast-literal centroid table for [[NearestCentroidExpr]]
  * (same collect-the-model pattern as [[LangProfile]]): ids ascending,
  * cosine arithmetic identical to the relational form (sequential DOUBLE
  * folds, strict `>` keeps the smallest id on ties — matching
  * `max_by(centroid_id, struct(csim, -centroid_id))`). */
final class CentroidIndex(val ids: Array[Long], vecs: Array[Array[Float]])
    extends Serializable {
  private def dot(a: Array[Float], b: ArrayData, n: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  private val norms: Array[Double] = vecs.map { v =>
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  def assign(vec: ArrayData): Long = {
    val n = vec.numElements()
    // fail loudly on a dimension mismatch: a silent min-length truncation
    // would score the prefix against the FULL centroid norm and return a
    // confident wrong argmax, while the relational form's zip_with dot
    // nulls out — the two forms this expression is asserted identical to
    // would diverge
    require(ids.isEmpty || vecs(0).length == n,
      s"vector dim $n != centroid dim ${if (ids.isEmpty) -1 else vecs(0).length}")
    var vn = 0.0
    var i = 0
    while (i < n) { val x = vec.getFloat(i).toDouble; vn += x * x; i += 1 }
    vn = math.sqrt(vn)
    var best = 0
    var bestSim = Double.NegativeInfinity
    i = 0
    while (i < ids.length) {
      val m = vecs(i).length
      val cs = dot(vecs(i), vec, m) / (vn * norms(i))
      // Double.compare, not `>`: Spark's SQL ordering (and so max_by in
      // the relational form) ranks NaN above every double — a zero-norm
      // vector (cs = NaN) must win here too, or the two forms diverge.
      // NaN-vs-NaN compares equal, so the first (smallest id) is kept,
      // matching max_by's -centroid_id tiebreak.
      if (java.lang.Double.compare(cs, bestSim) > 0) { bestSim = cs; best = i }
      i += 1
    }
    ids(best)
  }
}

/** nearest_centroid(vec): id of the max-cosine centroid from a baked-in
  * [[CentroidIndex]] — the zero-shuffle IVF assignment. */
case class NearestCentroidExpr(child: Expression, index: CentroidIndex)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "nearest_centroid"
  override def nullSafeEval(input: Any): Any =
    index.assign(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidIndex", index, classOf[CentroidIndex].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.assign($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-level entry point for the codegen'd dot product. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductFloat(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def nearestCentroid(vec: Column, index: CentroidIndex): Column =
    ColumnBridge.column(NearestCentroidExpr(ColumnBridge.expression(vec), index))
}

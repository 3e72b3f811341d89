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
  * `zip_with` null propagation). Arrays of unequal length use the common
  * prefix (fixture vectors are fixed 64-dim).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_float"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level entry point for the codegen'd dot product. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductFloat(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

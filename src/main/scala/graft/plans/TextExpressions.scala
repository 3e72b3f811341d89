package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions over the [[TextKernels]] per-row kernels
  * (SURVEY.md §2.10 `expr_custom`). Each `doGenCode` emits a single
  * static call, so the enclosing stage stays one WholeStageCodegen span;
  * the loops themselves live in JIT-compiled Scala rather than Janino
  * source. Bit-for-bit equality with the composable forms is asserted in
  * TextKernelsSpec. */

/** simhash64(text): 64-bit SimHash of whitespace tokens. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_sig(text): ARRAY<BIGINT> MinHash signature (numPerm positions,
  * shingleSize-word shingles). */
case class MinHashSigExpr(child: Expression, numPerm: Int, shingleSize: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashSig(input.asInstanceOf[UTF8String], numPerm, shingleSize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.minhashSig($c, $numPerm, $shingleSize)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** winnow_fingerprints(text): sorted distinct ARRAY<BIGINT> winnowing
  * fingerprints (char k-grams, w-windows). */
case class WinnowFingerprintExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"
  override def nullSafeEval(input: Any): Any =
    TextKernels.winnowFingerprints(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.winnowFingerprints($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** shingle_hash_set(text): sorted distinct ARRAY<BIGINT> of word-shingle
  * hashes. */
case class ShingleHashSetExpr(child: Expression, shingleSize: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"
  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashSet(input.asInstanceOf[UTF8String], shingleSize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.shingleHashSet($c, $shingleSize)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** repetition_stats(text, n): STRUCT<n_grams, max_c, dup_c BIGINT> —
  * per-row word n-gram repetition signals (total grams, top-gram count,
  * duplicated-gram mass). Exact byte-compared counts. */
case class RepetitionStatsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("max_c", LongType, nullable = false),
    StructField("dup_c", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"
  override def nullSafeEval(input: Any): Any =
    TextKernels.repetitionStats(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"(InternalRow) graft.plans.TextKernels.repetitionStats($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** srp_sketch(vec): sign-random-projection LSH sketch of an ARRAY<FLOAT>
  * (bits hyperplanes, deterministic from seed). */
case class SrpSketchExpr(child: Expression, bits: Int, seed: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_sketch"
  override def nullSafeEval(input: Any): Any =
    TextKernels.srpSketch(input.asInstanceOf[ArrayData], bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.srpSketch($c, $bits, $seed)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** char_entropy_bits(text): Shannon entropy (bits/char) of the
  * code-point distribution — DOUBLE, NULL-propagating. */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy_bits"
  override def nullSafeEval(input: Any): Any =
    TextKernels.charEntropyBits(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.charEntropyBits($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** levenshtein_within(a, b, k): edit distance if ≤ k else −1 — value-
  * identical to Spark's `levenshtein(a, b, k)` (LevenshteinSpec), ~11×
  * faster on close pairs via a banded code-point DP (TextKernels). */
case class LevenshteinWithinExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "levenshtein_within"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.levenshteinWithin(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.TextKernels.levenshteinWithin($a, $b, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextExpressions {
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(text)))

  def minhashSig(text: Column, numPerm: Int = 64, shingleSize: Int = 3): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(text), numPerm, shingleSize))

  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    ColumnBridge.column(WinnowFingerprintExpr(ColumnBridge.expression(text), k, w))

  def shingleHashSet(text: Column, shingleSize: Int = 3): Column =
    ColumnBridge.column(ShingleHashSetExpr(ColumnBridge.expression(text), shingleSize))

  def srpSketch(vec: Column, bits: Int, seed: Int = 42): Column =
    ColumnBridge.column(SrpSketchExpr(ColumnBridge.expression(vec), bits, seed))

  def repetitionStats(text: Column, n: Int): Column =
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(text), n))

  def charEntropy(text: Column): Column =
    ColumnBridge.column(CharEntropyExpr(ColumnBridge.expression(text)))

  def levenshteinWithin(a: Column, b: Column, k: Int): Column =
    ColumnBridge.column(LevenshteinWithinExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b), k))
}

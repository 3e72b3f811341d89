package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top principal direction of an embedding column by FIXED-ROUND power
  * iteration — the spectral summary behind embedding whitening, drift
  * monitoring ("did the dominant direction move between snapshots?")
  * and anisotropy diagnostics (LLM embeddings are notoriously
  * dominated by a single direction). Uncentered moment form: v ←
  * normalize(Σᵢ xᵢ (xᵢ·v)), the classic matrix-free iteration — no
  * covariance matrix is ever materialized.
  *
  * Cross-engine determinism (SURVEY §7.4, the [[Clustering]] recipe
  * extended to spectral state):
  *  - components quantize once to integer micro-units (`qx`, 10⁻⁶ grid);
  *  - per row, dot = Σ qx·qv is EXACT BIGINT (≤ 64·10¹²); it is
  *    re-gridded to 10⁻⁶ units via `floor(dot/10⁶)` computed as a
  *    DOUBLE floor (dot ≤ 6.4·10¹³ < 2⁵³, so the division is one
  *    correctly-rounded IEEE op — NOT integer `div`, whose
  *    truncate-toward-zero disagrees with floor for negative dots);
  *  - the new direction's per-dim sums Σ qx·dq are again exact BIGINT;
  *  - normalization re-grids the sums by a data-derived power C
  *    (max|s| capped at 10⁸) so Σ sq² is an EXACT long — then
  *    norm = sqrt(exact integer) is correctly rounded by IEEE contract,
  *    and re-quantization `floor(sq/norm·10⁶+0.5)` is one identical
  *    chain on both engines. Round r+1 starts from bit-identical state.
  * The seed is the first coordinate axis (q·e₁); the fixed round count
  * makes the sign deterministic (no eigensign ambiguity across runs).
  * A zero iterate (degenerate all-zero data) keeps the previous
  * direction instead of dividing by zero.
  *
  * Scale shape (100 TB): per round ONE scan — a narrow codegen'd HOF
  * dot against the 64-long BROADCAST-LITERAL direction, then one
  * map-side-combined aggregate whose exchange carries dims cells per
  * partition; the only driver materialization is that dims-row frame
  * per round (bounded; GuardSpec-inventoried). The final projection is
  * a pure narrow pass.
  */
object Pca {

  private val Q = 1000000L

  private def qe: Column =
    transform(col("embedding"), x => floor(x.cast("double") * Q + lit(0.5)).cast("long"))

  /** dot of the quantized row vector against a literal direction,
    * re-gridded to 10⁻⁶ units with a FLOOR (not truncate) division. */
  private def dotQ(v: Array[Long]): Column =
    floor(
      aggregate(zip_with(col("qe"), typedLit(v.toSeq), (x, y) => x * y),
        lit(0L), (acc, t) => acc + t).cast("double") / Q).cast("long")

  /** The quantized direction after `rounds` power iterations (1e-6 grid,
    * ≈ unit length in micro-units) — the shared state behind
    * [[topPcProjection]] and [[whitenResidualNorm]]. */
  def topDirection(emb: DataFrame, dims: Int, rounds: Int): Array[Long] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val q = emb.select(col("vec_id"), qe.as("qe"))

    // seed: the first coordinate axis on the 1e-6 grid
    var v: Array[Long] = Array.tabulate(dims)(d => if (d == 0) Q else 0L)

    for (_ <- 1 to rounds) {
      // one scan: narrow dot, then dims column-sums in ONE global
      // aggregate (round 15) — the old posexplode multiplied the row
      // count by dims and paid a dims-group hash aggregate per round;
      // per-dim sums as parallel agg buffers keep the pass narrow and
      // return the whole iterate as a single bounded row. Same exact
      // LONG sums, same grouping — bit-identical state.
      val s = new Array[Long](dims)
      val sums = q.select(dotQ(v).as("dq"), col("qe"))
        .agg(sum(element_at(col("qe"), 1) * col("dq")).as("s0"),
          (1 until dims).map(i =>
            sum(element_at(col("qe"), i + 1) * col("dq")).as(s"s$i")): _*)
        .collect()(0)
      for (i <- 0 until dims) if (!sums.isNullAt(i)) s(i) = sums.getLong(i)
      // re-grid so the norm accumulates exactly: cap max|sq| at 1e8 ⇒
      // Σ sq² ≤ 64·10¹⁶ fits a long with headroom
      val maxAbs = s.map(math.abs).max
      // the cap divisor rides the SAME double chain the oracle runs
      // (double-floor-division can differ from integer division by one
      // near a boundary — agreement matters, not the true quotient)
      val c = math.max(1L, math.floor(maxAbs.toDouble / 100000000.0).toLong)
      val sq = s.map(x => math.floor(x.toDouble / c).toLong)
      val norm2 = sq.map(x => x * x).sum
      if (norm2 > 0L) {
        val norm = math.sqrt(norm2.toDouble)
        v = sq.map(x => math.floor(x.toDouble / norm * Q + 0.5).toLong)
      } // else: degenerate zero iterate — keep the previous direction
    }
    v
  }

  /** Runs `rounds` power iterations and returns each vector's projection
    * on the resulting direction: `(vec_id, score)` ordered by `vec_id`,
    * score r4-rounded. `emb` needs (`vec_id`, `embedding: array<float>`)
    * with non-null, equal-length vectors; `dims` must match the vector
    * width. */
  def topPcProjection(emb: DataFrame, dims: Int, rounds: Int): DataFrame = {
    val v = topDirection(emb, dims, rounds)
    emb.select(col("vec_id"), qe.as("qe"))
      .select(col("vec_id"),
        graft.functions.Num.r4(
          aggregate(zip_with(col("qe"), typedLit(v.toSeq), (x, y) => x * y),
            lit(0L), (acc, t) => acc + t).cast("double") / lit(1.0e12))
          .as("score"))
      .orderBy("vec_id")
  }

  /** "All-but-the-top" residual: each vector's norm AFTER removing its
    * component along the top principal direction — the standard
    * embedding post-processing/anisotropy diagnostic (a corpus whose
    * residual norms collapse is dominated by one direction). Returns
    * `(vec_id, resid_norm)` r4-rounded, ordered by `vec_id`.
    *
    * Exactness: with qx, qv on the 1e-6 grid, s2 = Σ qx² and
    * d = Σ qx·qv are EXACT BIGINTs (≤ ~2.6·10¹⁴ < 2⁵³, so their double
    * images are exact); resid² = s2 − d²/|qv|² is then a fixed chain of
    * three correctly-rounded IEEE ops on identical inputs in both
    * engines, clamped at 0 (a vector parallel to the direction can land
    * an ulp below), and √/÷10⁶/r4 complete the identical chain.
    *
    * Scale shape: the direction build is [[topDirection]] (one scan per
    * round); the residual itself is ONE narrow codegen pass against the
    * broadcast-literal direction — no shuffle beyond the final sort. */
  def whitenResidualNorm(emb: DataFrame, dims: Int, rounds: Int): DataFrame = {
    val v = topDirection(emb, dims, rounds)
    val n2v = v.map(x => x * x).sum.toDouble // exact long, exact double
    val q = emb.select(col("vec_id"), qe.as("qe"))
    val d = aggregate(zip_with(col("qe"), typedLit(v.toSeq), (x, y) => x * y),
      lit(0L), (acc, t) => acc + t).cast("double")
    val s2 = aggregate(col("qe"), lit(0L), (acc, t) => acc + t * t).cast("double")
    q.select(col("vec_id"),
        graft.functions.Num.r4(
          sqrt(greatest(s2 - d * d / lit(n2v), lit(0.0))) / lit(1.0e6))
          .as("resid_norm"))
      .orderBy("vec_id")
  }
}

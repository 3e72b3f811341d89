package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two snapshots of a column —
  * the Population Stability Index (PSI), the standard train-vs-serve /
  * corpus-vs-refresh drift alarm a data platform runs per column:
  * PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) over fixed-width bins, with p the
  * current share and q the reference share.
  *
  * Determinism contract:
  *  - bin breaks derive from the REFERENCE min/max (exact parquet
  *    doubles; the break arithmetic is the same IEEE chain both
  *    engines run, `least/greatest`-clamped at the edges);
  *  - Laplace smoothing ((c+1)/(n+B)) keeps every bin defined with no
  *    ε knob, as exact a rational as doubles allow;
  *  - each bin's PSI term is quantized to the 1e-8 grid BEFORE the
  *    cross-bin sum (LONG addition — merge-order-proof, the
  *    `graph_pagerank` recipe), with r4 on the final value absorbing
  *    libm `ln` ulp drift (the `text_ngram_lm` contract).
  *
  * Scale shape: one map-side-combined bin-count aggregate per side
  * (the only full-data passes), a 1-row break/total frame broadcast to
  * both, the complete B-row bin spine generated from a literal
  * sequence, and a B-row final sum. Nothing is collected; the fact
  * tables are never shuffled (counts move ≤ B rows per side). */
object Drift {

  /** One row: `(psi, n_ref, n_cur)` for `value` binned into `bins`
    * fixed-width buckets over the reference's [min, max]. Rows with
    * NULL value are ignored; a degenerate reference (min = max) puts
    * all mass in bin 0 on both sides (PSI then measures pure count
    * imbalance, which smoothing bounds). */
  def psi(ref: DataFrame, cur: DataFrame, value: Column, bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val spark = ref.sparkSession
    val breaks = ref.filter(value.isNotNull)
      .agg(min(value).cast("double").as("__lo"), max(value).cast("double").as("__hi"))
    def binned(df: DataFrame): DataFrame =
      df.filter(value.isNotNull).crossJoin(broadcast(breaks))
        .select(
          when(col("__hi") === col("__lo"), lit(0)).otherwise(
            least(lit(bins - 1), greatest(lit(0),
              floor((value.cast("double") - col("__lo")) /
                ((col("__hi") - col("__lo")) / bins)).cast("int")))).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("c"))
    val spine = broadcast(breaks)
      .select(explode(sequence(lit(0), lit(bins - 1))).as("bin"))
    val cr = binned(ref).withColumnRenamed("c", "c_ref")
    val cc = binned(cur).withColumnRenamed("c", "c_cur")
    val full = spine
      .join(cr, Seq("bin"), "left_outer").join(cc, Seq("bin"), "left_outer")
      .select(col("bin"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    val tot = full.agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"))
    val p = (col("c_cur") + lit(1.0)) / (col("n_cur") + lit(bins.toDouble))
    val q = (col("c_ref") + lit(1.0)) / (col("n_ref") + lit(bins.toDouble))
    full.crossJoin(broadcast(tot))
      .select(col("n_ref"), col("n_cur"),
        floor((p - q) * log(p / q) * lit(100000000.0) + lit(0.5))
          .cast("long").as("__t"))
      .groupBy("n_ref", "n_cur")
      .agg(graft.functions.Num.r4(sum("__t").cast("double") / lit(100000000.0)).as("psi"))
      .select(col("psi"), col("n_ref"), col("n_cur"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic, exact-integer form:
    * D_scaled = max_v |n₂·F₁(v) − n₁·F₂(v)| (both ECDFs cross-
    * multiplied to clear denominators — pure BIGINT under any merge
    * order; regime n₁·n₂ < 2⁶³). One row out: (n1, n2, d_scaled,
    * at_value, ks) with ties at equal D broken to the SMALLEST value
    * and ks = D_scaled/(n₁·n₂) the only float (one IEEE division on
    * the 1e-8 grid).
    *
    * Scale shape: per-value counts are ONE map-side-combined exchange;
    * the global ECDF is the `pack_chunks` two-phase prefix sum (range-
    * bucketed parallel cumsums + a bounded per-bucket base frame —
    * never the single-task global window); totals ride a 1-row
    * broadcast; the argmax is one struct-max aggregate. */
  /** First-significant-digit frequencies of an integer-cents amount
    * column vs Benford's law, with a per-digit χ² contribution — the
    * classic fabricated-/synthetic-data forensic audit on any natural
    * monetary or size column (uniform generators fail it loudly; organic
    * multiplicative data passes).
    *
    * Determinism contract: the value is quantized to cents FIRST
    * (floor(x·100 + 0.5) — one IEEE mult both engines share, then an
    * exact BIGINT) so the leading digit comes from integer RENDERING,
    * never from a libm log10 whose ulp could flip 999.999…→1000;
    * Benford probabilities enter as integer micro-unit literals computed
    * once driver-side and pasted into both engines; the expected mass
    * e_scaled = N·p_micro and the deviation dev = n_obs·10⁸ − e_scaled
    * are pure BIGINT; chi_term = dev²/(e_scaled·10⁸) is a short IEEE
    * chain on exact-in-double longs, on the 1e-8 grid.
    *
    * Scale shape: ONE map-side-combined 9-row count aggregate is the
    * only full-data pass; the digit spine and the probability table are
    * 9-row literals; N rides a one-row broadcast. */
  def benfordScaled(df: DataFrame, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val spine = benfordMicro.toSeq.sortBy(_._1).toDF("digit", "p_micro")
    val cents = df.select(floor(value * 100 + 0.5).cast("long").as("c"))
      .filter(col("c").isNotNull && col("c") > 0)
    val cnt = cents
      .select(substring(col("c").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val n = cnt.agg(sum(col("n_obs")).as("n_total"))
    spine.join(cnt, Seq("digit"), "left_outer")
      .crossJoin(broadcast(n))
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("p_micro"), (col("n_total") * col("p_micro")).as("e_scaled"),
        (coalesce(col("n_obs"), lit(0L)) * 100000000L
          - col("n_total") * col("p_micro")).as("dev"))
      .withColumn("chi_term", graft.functions.Num.r8(
        col("dev").cast("double") * col("dev").cast("double")
          / (col("e_scaled").cast("double") * 100000000.0)))
  }

  /** floor(log10(1 + 1/d)·10⁸ + 0.5) for d = 1..9 — computed once here,
    * interpolated verbatim into the oracle SQL so both engines share the
    * exact same integer constants. */
  val benfordMicro: Map[Int, Long] = (1 to 9).map { d =>
    d -> math.floor(math.log10(1.0 + 1.0 / d) * 1e8 + 0.5).toLong
  }.toMap

  def ksScaled(df: DataFrame, value: Column, isRef: Column,
      bucketWidth: Double = 10000.0): DataFrame = {
    val cnt = df.select(value.as("v"), isRef.as("ref"))
      .groupBy("v").agg(
        sum(when(col("ref"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("ref"), 1L).otherwise(0L)).as("c2"))
      .withColumn("__bucket", floor(col("v") / lit(bucketWidth)).cast("long"))
    val W = org.apache.spark.sql.expressions.Window
    val wLoc = W.partitionBy("__bucket").orderBy("v")
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wBase = W.orderBy(col("__bucket").asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow - 1)
    val local = cnt
      .withColumn("l1", sum("c1").over(wLoc))
      .withColumn("l2", sum("c2").over(wLoc))
    val bases = cnt.groupBy("__bucket")
      .agg(sum("c1").as("t1"), sum("c2").as("t2"))
      .select(col("__bucket"),
        coalesce(sum(col("t1")).over(wBase), lit(0L)).as("b1"),
        coalesce(sum(col("t2")).over(wBase), lit(0L)).as("b2"))
    val tot = cnt.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    local.join(broadcast(bases), "__bucket")
      .crossJoin(broadcast(tot))
      .select(col("v"), col("n1"), col("n2"),
        abs(col("n2") * (col("b1") + col("l1"))
          - col("n1") * (col("b2") + col("l2"))).as("d"))
      .agg(max(struct(col("d"), (-col("v")).as("nv"),
        col("n1"), col("n2"))).as("m"))
      .select(col("m.n1").as("n1"), col("m.n2").as("n2"),
        col("m.d").as("d_scaled"), (-col("m.nv")).as("at_value"),
        graft.functions.Num.r8(col("m.d").cast("double")
          / (col("m.n1") * col("m.n2")).cast("double")).as("ks"))
  }
}

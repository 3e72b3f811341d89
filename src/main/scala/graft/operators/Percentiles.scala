package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact DISCRETE percentiles from the value-count distribution.
  *
  * Spark's built-in `percentile` is exact but buffers every value per
  * group in the aggregation buffer — memory O(group size), the thing
  * that OOMs at 100 TB. For discrete domains (quantities, ratings,
  * token counts, star levels) the scalable shape is the COUNT
  * DISTRIBUTION: the only full-data pass is a partial-aggregated
  * groupBy moving (group, value, count) — O(distinct values) rows per
  * group — after which two windows over the tiny distribution and one
  * final aggregate pick every requested quantile at once. Memory per
  * task is bounded by the value domain, never by row count.
  *
  * Semantics are SQL `PERCENTILE_DISC(p)` = DuckDB `quantile_disc`:
  * the smallest value whose cumulative count reaches `ceil(p·n)`
  * (1-based). Both engines compute `p·n` in IEEE double, so boundary
  * behavior agrees bit-for-bit (oracle-gated as `agg_percentile_disc`).
  */
object Percentiles {

  /** One output row per group: `groupCols ++ probs.map(_._1)`, where
    * each named prob column holds that exact discrete percentile of
    * `valueCol`. */
  def exactDiscrete(df: DataFrame, valueCol: String, groupCols: Seq[String],
      probs: Seq[(String, Double)]): DataFrame = {
    require(probs.nonEmpty, "need at least one (name, prob)")
    val g = groupCols.map(col)
    // NULLs are ignored, matching SQL PERCENTILE_*/Spark `percentile`
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol): _*)
      .agg(count(lit(1)).as("__cnt"))
    val cum = counts
      .withColumn("__cum",
        sum("__cnt").over(Window.partitionBy(g: _*).orderBy(col(valueCol))))
      .withColumn("__n", sum("__cnt").over(Window.partitionBy(g: _*)))
    val picks = probs.map { case (name, p) => pick(valueCol, p).as(name) }
    cum.groupBy(g: _*).agg(picks.head, picks.tail: _*)
  }

  /** Smallest value whose cumulative count reaches ceil(p·n). */
  private def pick(valueCol: String, p: Double): Column =
    min(when(col("__cum") >= ceil(lit(p) * col("__n")), col(valueCol)))

  /** Exact WEIGHTED quantiles: the smallest value whose cumulative
    * WEIGHT reaches p·W (lower weighted quantile, the `type=1`
    * estimator generalized to weights) — the distribution summary for
    * weighted corpora, where each row carries an importance/sampling
    * weight and an unweighted percentile would misstate the mass.
    *
    * Exactness contract: `weightCol` must be integral-valued (counts,
    * integer-quantized weights) — it is cast to BIGINT, so cumulative
    * sums are exact and merge-order-proof, and the reach test
    * `q·cum ≥ p_num·W` is pure integer arithmetic (p = p_num/q as a
    * rational, e.g. median = 1/2) — no float boundary anywhere.
    *
    * Scale shape = [[exactDiscrete]]: the only full-data pass is the
    * map-side-combined (group, value) weight-sum; the cumulative walk
    * runs on the distribution (O(distinct) rows). Rows with NULL value
    * or non-positive weight are ignored. */
  def weightedQuantile(df: DataFrame, valueCol: String, weightCol: String,
      groupCols: Seq[String], probs: Seq[(String, Int, Int)]): DataFrame = {
    require(probs.nonEmpty, "need at least one (name, p_num, p_den)")
    probs.foreach { case (n, pn, pd) =>
      require(pn > 0 && pd > 0 && pn <= pd, s"prob $n must satisfy 0 < p_num <= p_den")
    }
    val g = groupCols.map(col)
    val counts = df
      .filter(col(valueCol).isNotNull && col(weightCol) > 0)
      .groupBy(g :+ col(valueCol): _*)
      .agg(sum(col(weightCol).cast("long")).as("__w"))
    val w = Window.partitionBy(g: _*).orderBy(col(valueCol))
    val cum = counts
      .withColumn("__cum", sum("__w").over(w))
      .withColumn("__tw", sum("__w").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val picks = probs.map { case (name, pn, pd) =>
      min(when(col("__cum") * pd >= col("__tw") * pn, col(valueCol))).as(name)
    }
    cum.groupBy(g: _*).agg(picks.head, picks.tail: _*)
  }

  /** Exact CONTINUOUS (interpolated) percentiles — SQL `PERCENTILE_CONT`
    * = DuckDB `quantile_cont` = Spark `percentile` semantics: with
    * 0-indexed position `pos = p·(n−1)`, interpolate between the sorted
    * values at `floor(pos)` and `ceil(pos)`.
    *
    * Same scale shape as [[exactDiscrete]]: the only full-data pass is
    * the partial-aggregated (group, value, count) groupBy; the sorted
    * walk happens on the distribution (O(distinct) rows), not the data.
    * The value at index i is "the smallest value whose cumulative count
    * reaches i+1", so each quantile needs two conditional mins over the
    * distribution — constant-size buffers, never a per-group value
    * array. Replaces the built-in `percentile` (which buffers every row
    * per group — the thing that OOMs at 100 TB) for exact analytics. */
  def exactContinuous(df: DataFrame, valueCol: String, groupCols: Seq[String],
      probs: Seq[(String, Double)]): DataFrame = {
    require(probs.nonEmpty, "need at least one (name, prob)")
    val g = groupCols.map(col)
    // NULLs are ignored, matching SQL PERCENTILE_*/Spark `percentile`
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol): _*)
      .agg(count(lit(1)).as("__cnt"))
    // __n rides the SAME ordered window spec with an explicit full frame,
    // so both expressions share one exchange + one sort (a second
    // unordered Window would add its own pass)
    val w = Window.partitionBy(g: _*).orderBy(col(valueCol))
    val cum = counts
      .withColumn("__cum", sum("__cnt").over(w))
      .withColumn("__n", sum("__cnt").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    interpolateFromCum(cum, valueCol, g, probs)
  }

  /** Exact CONTINUOUS percentiles for NEAR-UNIQUE domains — identical
    * semantics (and bit-identical picks) to [[exactContinuous]], different
    * scale shape: when values barely repeat, the (group, value) counts
    * aggregate compresses nothing, so its hash build + extra exchange are
    * pure overhead. This form ships raw (group, value) rows through ONE
    * exchange on the group key and takes the cumulative count from
    * `row_number` over the sorted run — the sort is spill-managed
    * (UnsafeExternalSorter), so task memory stays bounded where the
    * built-in buffering `percentile` would hold the group in ONE
    * aggregation buffer. Ties are handled exactly: the i-th smallest via
    * `min(value WHERE row_number ≥ i)` is well-defined under any tie
    * order. Measured ~2.7× faster than [[exactContinuous]] on the
    * near-unique price column at sf0.1. */
  def exactContinuousSorted(df: DataFrame, valueCol: String, groupCols: Seq[String],
      probs: Seq[(String, Double)]): DataFrame = {
    require(probs.nonEmpty, "need at least one (name, prob)")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(valueCol))
    val cum = df.select(g :+ col(valueCol): _*)
      .filter(col(valueCol).isNotNull) // match SQL PERCENTILE_* null handling
      .withColumn("__cum", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    interpolateFromCum(cum, valueCol, g, probs)
  }

  /** Exact CONTINUOUS percentiles for SEVERAL value columns in ONE pass
    * via histogram + target-bucket refinement — the full data never
    * rides a shuffle and is never sorted.
    *
    * The selection problem (value at rank r of a sorted run) doesn't
    * need the run sorted — only the bucket CONTAINING rank r does:
    *
    *   1. unpivot the columns to (group…, column, value) rows and bucket
    *      each row by `floor(value / width_col)` — order-preserving, so
    *      per-(group, column) the buckets partition the sorted run;
    *   2. histogram: count per (group…, column, bucket) — the only
    *      full-data aggregate, map-side combined, so the shuffle moves
    *      O(buckets) rows; a window over the tiny histogram yields each
    *      bucket's exclusive prefix `__base` and the group total `__n`;
    *   3. mark the buckets whose (base, base+cnt] span contains a
    *      requested rank `floor/ceil(p·(n−1))+1` — a column predicate,
    *      no driver round-trip — and broadcast-join the marks back:
    *      only rows in target buckets (≈ quantiles × bucket population)
    *      survive to the within-bucket `row_number` sort;
    *   4. the rank-r value is picked by equality on
    *      `__cum = base + local rank` — globally valid because bucket
    *      order is value order.
    *
    * Costs: two narrow scans (histogram, refinement filter), one
    * O(buckets) shuffle, one sort of only the target buckets. Ties
    * never straddle buckets (equal values share a bucket), so picks are
    * bit-identical to [[exactContinuous]] — asserted in PercentilesSpec.
    * Specs are (column, bucketWidth, quantiles); width only affects the
    * refinement selectivity, never results (any positive width is
    * correct — aim for tens-to-hundreds of buckets over the column's
    * domain). Quantile names must be unique across specs. At 100 TB the
    * broadcast is O(groups × quantiles) marked buckets — bounded like
    * the pivot domain, and per-bucket sorts are spill-managed. */
  def exactContinuousMulti(df: DataFrame, groupCols: Seq[String],
      specs: Seq[(String, Double, Seq[(String, Double)])]): DataFrame = {
    require(specs.nonEmpty && specs.forall(_._3.nonEmpty), "need (col, width, probs) specs")
    require(specs.forall(_._2 > 0), "bucket widths must be positive")
    val names = specs.flatMap(_._3.map(_._1))
    require(names.distinct.size == names.size, "quantile names must be unique")
    val g = groupCols.map(col)
    val gn = groupCols
    val widthFor = specs.map { case (c, wd, _) => (c, lit(wd)) }
    def mkLong(base: DataFrame): DataFrame = base
      .select(g ++ specs.map { case (c, _, _) => col(c).cast("double").as(c) }: _*)
      .unpivot(g.toArray, specs.map(s => col(s._1)).toArray, "__c", "__v")
      // unpivot already drops null measure values (so NULLs are ignored,
      // matching SQL PERCENTILE_*), but keep the filter explicit: the
      // contract must not silently change if the reshape ever does
      .filter(col("__v").isNotNull)
      .withColumn("__bkt", floor(col("__v") / widthFor.tail.foldLeft(
        widthFor.head._2) { case (acc, (c, wd)) => when(col("__c") === c, wd).otherwise(acc) })
        .cast("long"))
    val long = mkLong(df)
    def pos(p: Double): Column = lit(p) * (col("__n").cast("double") - 1.0)
    // phase 2: histogram + prefix sums over it (tiny window)
    val wBase = Window.partitionBy(g :+ col("__c"): _*).orderBy(col("__bkt").asc)
    val bases = long.groupBy((g :+ col("__c")) :+ col("__bkt"): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__base", coalesce(sum(col("__cnt")).over(
        wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(
        wBase.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // phase 3: keep only buckets containing a requested rank
    def hits(r: Column): Column = col("__base") < r && r <= col("__base") + col("__cnt")
    val neededCond = specs.map { case (c, _, probs) =>
      col("__c") === c && probs.map { case (_, p) =>
        hits(floor(pos(p)) + 1) || hits(ceil(pos(p)) + 1)
      }.reduce(_ || _)
    }.reduce(_ || _)
    val needed = bases.filter(neededCond)
      .select((gn.map(col) :+ col("__c") :+ col("__bkt") :+ col("__base") :+ col("__n")): _*)
      // tiny by construction (O(groups × quantiles) rows); materialized
      // once so the refinement branch below reads cached blocks instead
      // of re-running the whole histogram subtree inside the big plan
      .localCheckpoint(true)
    // phase 3.5 (round 9 — the probe read the refinement pass at ~80% of
    // the query's sf1 cost): collect the target BUCKET IDS (bounded like
    // the pivot domain, the IVF-centroid collect pattern) and turn them
    // into RAW-COLUMN range predicates, so the second pass reaches the
    // parquet reader as pushable value-range filters instead of a full
    // re-scan. The ±1-bucket pad makes the range form a guaranteed
    // superset of floor(v/w) membership (the two can disagree by an ulp
    // at a boundary); the __bkt equi-join below restores exact
    // membership.
    val bktsByCol: Map[String, Array[Long]] = needed
      .select(col("__c"), col("__bkt")).distinct().collect()
      .groupBy(_.getString(0)).map { case (c, rows) => c -> rows.map(_.getLong(1)) }
    val rawPrefilter = specs.map { case (c, wd, _) =>
      bktsByCol.get(c) match {
        case Some(bkts) => bkts.map(b =>
          col(c).cast("double") >= lit((b - 1) * wd) &&
            col(c).cast("double") < lit((b + 2) * wd)).reduce(_ || _)
        case None => lit(false)
      }
    }.reduce(_ || _)
    // phase 4: refine ONLY the target buckets — and never ship raw rows:
    // target-bucket rows collapse to their per-VALUE counts first (a
    // map-side-combined aggregate, so the shuffle moves distinct values,
    // not rows), then one window over the per-value distribution assigns
    // cumulative ranks. The rank-r value is the one whose cumulative
    // span (cum−vc, cum] contains r — identical picks to a row_number
    // form (ties share a value row), asserted in PercentilesSpec.
    val wLocal = Window.partitionBy((g :+ col("__c")) :+ col("__bkt"): _*)
      .orderBy(col("__v"))
    val cum = mkLong(df.filter(rawPrefilter)).join(broadcast(needed), gn ++ Seq("__c", "__bkt"))
      .groupBy((g :+ col("__c") :+ col("__bkt") :+ col("__base") :+ col("__n")) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__vc"))
      .withColumn("__cum", col("__base") + sum(col("__vc")).over(
        wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    def atRank(c: String, r: Column): Column =
      when(col("__c") === c && r > col("__cum") - col("__vc") && r <= col("__cum"),
        col("__v"))
    val aggs = specs.flatMap { case (c, _, probs) =>
      probs.flatMap { case (name, p) =>
        Seq(
          min(atRank(c, floor(pos(p)) + 1)).as(s"__lo_$name"),
          min(atRank(c, ceil(pos(p)) + 1)).as(s"__hi_$name"))
      }
    } ++ specs.map { case (c, _, _) =>
      max(when(col("__c") === c, col("__n"))).as(s"__n_$c")
    }
    val picked = cum.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
    val outs = specs.flatMap { case (c, _, probs) =>
      probs.map { case (name, p) =>
        val posC = lit(p) * (col(s"__n_$c").cast("double") - 1.0)
        val fr = posC - floor(posC)
        (col(s"__lo_$name") + fr * (col(s"__hi_$name") - col(s"__lo_$name"))).as(name)
      }
    }
    picked.select(g ++ outs: _*)
  }

  /** PERCENTILE_CONT interpolation over a cumulative distribution
    * (`__cum` 1-based cumulative count, `__n` group size): two
    * conditional mins per quantile pick the bracketing sorted values,
    * then linear interpolation — constant-size buffers. */
  private def interpolateFromCum(cum: DataFrame, valueCol: String,
      g: Seq[Column], probs: Seq[(String, Double)]): DataFrame = {
    def pos(p: Double): Column = lit(p) * (col("__n").cast("double") - 1.0)
    val aggs = probs.flatMap { case (name, p) =>
      Seq(
        min(when(col("__cum") >= floor(pos(p)) + 1, col(valueCol))).as(s"__lo_$name"),
        min(when(col("__cum") >= ceil(pos(p)) + 1, col(valueCol))).as(s"__hi_$name"))
    } :+ max("__n").as("__n")
    val picked = cum.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
    val outs = probs.map { case (name, p) =>
      val fr = pos(p) - floor(pos(p))
      (col(s"__lo_$name") +
        fr * (col(s"__hi_$name").cast("double") - col(s"__lo_$name").cast("double")))
        .as(name)
    }
    picked.select(g ++ outs: _*)
  }

  /** Median absolute deviation — the robust dispersion statistic
    * (outlier-proof where stddev is not; the standard robust-z
    * denominator for data-quality anomaly rules): per group,
    * med = PERCENTILE_DISC(0.5)(value) and mad = PERCENTILE_DISC(0.5)
    * (|value − med|). Output (groupCols…, med, mad).
    *
    * Exactness: the deviation is ONE IEEE subtraction + abs of values
    * both engines read identically from parquet, and both discrete
    * medians are picks of actual data values via [[exactDiscrete]]'s
    * gated ceil(p·n) rule — no rounding grid needed anywhere.
    *
    * Scale shape: exact MAD is irreducibly TWO passes over the data
    * (the second pass needs the first's median); each pass is the
    * count-distribution aggregate (map-side combined, memory
    * O(distinct values)); the medians attach back by a group-keyed
    * join of a |groups|-row frame (AQE broadcasts it when small). */
  def medianAbsDev(df: DataFrame, valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    val med = exactDiscrete(df, valueCol, groupCols, Seq("med" -> 0.5))
    val dev = df.filter(col(valueCol).isNotNull)
      .join(med, groupCols)
      .withColumn("__dev", abs(col(valueCol) - col("med")))
    exactDiscrete(dev, "__dev", groupCols, Seq("mad" -> 0.5))
      .join(med, groupCols)
      .select(groupCols.map(col) ++ Seq(col("med"), col("mad")): _*)
  }
}

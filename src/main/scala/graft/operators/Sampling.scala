package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling and dataset splitting (LLM
  * training-pipeline surface; SURVEY.md §2.11 extensions).
  *
  * Design: membership is decided by comparing the md5 hex digest of the
  * row's key against a fixed 128-bit threshold written as a 32-char hex
  * literal. That makes samples
  *  - deterministic (no RNG, no seed state, no partition dependence —
  *    unlike `df.sample`, which changes with partitioning),
  *  - stable under re-runs, engine versions, AND engines (any system
  *    with md5 draws the identical sample — the DuckDB oracle gates
  *    these queries exactly),
  *  - consistent across tables (the same key lands in the same split
  *    everywhere, so features and labels never straddle a train/val
  *    boundary).
  * At 100 TB each op is a narrow filter/projection — zero shuffle, full
  * pushdown of everything else around it.
  */
object Sampling {

  /** floor(2^128 · round(f·10⁹)/10⁹) as a 32-hex-char literal — exact
    * integer math over the fraction quantized to 1e-9 (the quantization
    * keeps round decimal fractions' hex literals stable for the oracle
    * SQL while supporting fractions down to ~1e-9; the old 1e-6 grid
    * silently emptied samples below 5e-7 — a real regime when drawing
    * ~10⁶ docs from a 10¹³-row corpus). Fractions too small for the
    * grid throw instead of silently selecting nothing. */
  private def hexThreshold(f: Double): String = {
    require(f >= 0 && f <= 1, s"fraction $f out of [0,1]")
    val q = (f * 1e9).round
    require(f == 0 || q >= 1,
      s"fraction $f below the 1e-9 threshold grid — would select nothing")
    val num = (BigInt(1) << 128) * BigInt(q) / BigInt(1000000000)
    val h = num.toString(16)
    if (h.length > 32) "f" * 32 else ("0" * (32 - h.length)) + h
  }

  /** The md5 hex of key || ':' || salt — the sampling coordinate. */
  private def coord(key: Column, salt: String): Column =
    md5(concat(key.cast("string"), lit(":" + salt)).cast("binary"))

  /** Keep ~`fraction` of rows, chosen by key hash. Same (key, salt) ⇒
    * same decision everywhere, forever. */
  def hashSample(df: DataFrame, key: Column, fraction: Double, salt: String = "s0"): DataFrame =
    df.filter(coord(key, salt) < lit(hexThreshold(fraction)))

  /** Assign each row to a named split by hex range; `weights` must sum to
    * 1 (e.g. Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)). */
  def splitColumn(key: Column, weights: Seq[(String, Double)], salt: String = "s0"): Column = {
    val bounds = weights.scanLeft(0.0)(_ + _._2).tail // cumulative
    val c = coord(key, salt)
    weights.init.zip(bounds.init).reverse.foldLeft(lit(weights.last._1)) {
      case (acc, ((name, _), hi)) => when(c < lit(hexThreshold(hi)), lit(name)).otherwise(acc)
    }
  }

  /** Corpus-MIXTURE sampling: per-source keep fractions — the
    * training-data mixture knob ("80% of src0, 25% of src2, 10% of the
    * long tail"). The row's source selects its hash threshold; sources
    * not listed use `default`. Same md5-threshold machinery as
    * [[hashSample]]: deterministic, partition-independent, a narrow
    * zero-shuffle filter at any scale, and any engine with md5 draws
    * the identical mixture (oracle-gated as `sample_mixture`). */
  /** Token-budget mixture sampling — the data-mixing op a training run
    * actually specifies ("X tokens of source S", not "p% of S's docs"):
    * per source, docs are taken in the reproducible 48-bit md5-shuffle
    * order ([[Packing.shardAssign]]'s coordinate) until the source's
    * TOKEN budget is exhausted. Keep rule: a doc survives iff its
    * per-source stream offset (tokens BEFORE it in shuffle order) is
    * < `budget` — the doc straddling the boundary is kept, so budgets
    * are honored to the nearest document (the standard contract).
    *
    * Pure integer end to end (coordinate, token counts, prefix sums) —
    * no threshold boundary can flake. Scale shape: the prefix sums are
    * the two-phase bucketed form per (source, coordinate-range bucket) —
    * never one window task per source — and only the O(sources×buckets)
    * totals frame is prefix-summed and broadcast back. */
  def tokenBudgetSample(df: DataFrame, id: Column, source: Column,
      tokens: Column, budget: Long, salt: String = "budget",
      buckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coordSpace = 281474976710656L // 2^48
    val bucketWidth = coordSpace / buckets
    val u = conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 12), 16, 10)
      .cast("long")
    val base = df.select(id.as("doc_id"), source.as("source"),
        tokens.cast("long").as("n_tokens"), u.as("__u"))
      .withColumn("__bucket", floor(col("__u") / bucketWidth).cast("long"))
    val w = Window.partitionBy(col("source"), col("__bucket"))
      .orderBy(col("__u").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("__local_end", sum(col("n_tokens")).over(w))
    val bases = base.groupBy("source", "__bucket")
      .agg(sum(col("n_tokens")).as("__tot"))
      .withColumn("__base", coalesce(sum(col("__tot")).over(
        Window.partitionBy(col("source")).orderBy(col("__bucket").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)), lit(0L)))
      .select("source", "__bucket", "__base")
    local.join(broadcast(bases), Seq("source", "__bucket"))
      .withColumn("__cum_before", col("__base") + col("__local_end") - col("n_tokens"))
      .filter(col("__cum_before") < budget)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("__cum_before").as("cum_before"))
  }

  def mixtureSample(df: DataFrame, key: Column, source: Column,
      rates: Seq[(String, Double)], default: Double, salt: String = "s0"): DataFrame = {
    val threshold = rates.foldLeft(lit(hexThreshold(default))) {
      case (acc, (name, f)) => when(source === lit(name), lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(coord(key, salt) < threshold)
  }

  /** Stratified hash sample: within each stratum value, keep ~`fraction`
    * of rows. The stratum participates in the hash so strata are sampled
    * independently; still a pure narrow filter. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column, fraction: Double,
      salt: String = "s0"): DataFrame =
    df.filter(md5(concat(stratum.cast("string"), lit("|"), key.cast("string"),
      lit(":" + salt)).cast("binary")) < lit(hexThreshold(fraction)))

  /** Temperature-resampled source mixture — the α-balancing recipe
    * multilingual/pretraining corpora use (sample source s in proportion
    * to n_s^α instead of n_s, α<1 flattening the head so low-resource
    * sources keep representation). Unlike [[mixtureSample]]'s
    * caller-fixed rates, the rates here are DERIVED FROM THE DATA:
    * target_s = min(n_s, round(keepRatio·N·n_s^α / Σ n_t^α)), then each
    * source keeps exactly its target count, chosen by hash rank (the
    * md5 coordinate orders rows "randomly" but identically on every
    * engine, so the selected set is deterministic and oracle-checkable
    * row-for-row).
    *
    * Scale shape: the count/target frames are O(#sources) and broadcast;
    * the EXACT-count selection ranks rows per source (one shuffle +
    * per-source sort). At 100 TB exactness is usually traded away: keep
    * the same targets but select by threshold `coord < t_s/n_s` — a pure
    * narrow filter off the same broadcast target frame (±√n count
    * noise), the [[hashSample]] shape. */
  def temperatureSample(df: DataFrame, key: Column, source: Column,
      alpha: Double, keepRatio: Double, salt: String = "s0"): DataFrame = {
    val tgt = temperatureTargets(df, source, alpha, keepRatio).drop("__n")
    val rn = row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy(source).orderBy(coord(key, salt), key))
    df.withColumn("__rn", rn)
      .join(broadcast(tgt), source === col("__src"))
      .filter(col("__rn") <= col("__t"))
      .drop("__rn", "__src", "__t")
  }

  /** Per-source keep targets for temperature sampling: (__src, __n, __t)
    * with t_s = min(n_s, round(keepRatio·N·n_s^α / Σ n_t^α)).
    *
    * Cross-engine-deterministic: per-source weights are n^α QUANTIZED TO
    * INTEGER micro-units (pow's last-ulp wobble vanishes into the
    * round), the weight sum is an exact integer (no float-association
    * order), and the final ratio is a single chain of IEEE ops over
    * identical integer inputs — both engines floor the same double.
    * Thresholding a raw pow/float-sum expression instead could flip a
    * source's keep count by one row whenever a target landed within an
    * ulp of a .5 boundary (§7.4's rule). O(#sources) rows. */
  private def temperatureTargets(df: DataFrame, source: Column,
      alpha: Double, keepRatio: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha out of (0,1]")
    require(keepRatio > 0 && keepRatio <= 1, s"keepRatio $keepRatio out of (0,1]")
    def wq(n: Column) =
      floor(pow(n.cast("double"), lit(alpha)) * lit(1000000.0) + lit(0.5)).cast("long")
    val cnt = df.groupBy(source.as("__src")).agg(count(lit(1)).as("__n"))
    val tot = cnt.agg(sum(col("__n")).as("__total"), sum(wq(col("__n"))).as("__wq"))
      .select(floor(lit(keepRatio) * col("__total") + lit(0.5)).cast("long").as("__k"),
        col("__wq"))
    cnt.crossJoin(broadcast(tot))
      .select(col("__src"), col("__n"),
        least(col("__n"),
          floor(col("__k").cast("double") * wq(col("__n")).cast("double")
            / col("__wq").cast("double") + lit(0.5)).cast("long")).as("__t"))
  }

  /** Threshold variant of [[temperatureSample]] — the 100 TB PRODUCTION
    * shape (round-8 verdict ask #2): IDENTICAL integer-quantized targets
    * t_s, but selection by per-source hash THRESHOLD instead of exact
    * rank. A row is kept iff its 48-bit md5-prefix coordinate
    * u ∈ [0, 2⁴⁸) satisfies u < floor(2⁴⁸·q_s/10⁹) with
    * q_s = round(10⁹·t_s/n_s) — every step either exact integer math or
    * one identical IEEE chain, so any engine with md5 draws the same
    * sample (oracle-gated as the PRIMARY `sample_temperature` row since
    * the round-10 rename; the rank form is `sample_temperature_rank`).
    *
    * What changes at scale: the exact form's per-source rank window —
    * a FULL shuffle + sort of the fact table (measured 4.5× per 10×
    * input at the round-8 probe) — disappears. This plan is one
    * O(#sources) aggregate, a broadcast join of the O(#sources)
    * threshold frame, and a narrow filter: the fact table is never
    * shuffled. The price is ±√n binomial noise around t_s instead of
    * an exact cut (t_s = n_s still keeps everything: the threshold
    * rounds to 2⁴⁸, above every coordinate). */
  /** Per-row WEIGHTED acceptance sampling: keep each row with
    * probability equal to its own `weight` (∈ [0,1], read on the r4
    * grid) — the soft quality-proportional filter of modern curation
    * recipes (keep good docs surely, middling docs sometimes), where
    * [[hashSample]] is the same coin with a single global fraction.
    *
    * Exact arithmetic end-to-end: wq = floor(w·10⁴+0.5) ∈ [0,10⁴]
    * (exact — r4-grid weights times 10⁴ recover their integer), keep
    * iff the 48-bit md5-prefix coordinate u < wq·2⁴⁸ div 10⁴ (the
    * product tops out at 2.8·10¹⁸ < Long.Max, the division is integer)
    * — so any engine with md5 draws the identical sample. w=1 rounds
    * the threshold to 2⁴⁸ and keeps everything; w=0 keeps nothing;
    * pointwise-larger weights keep a SUPERSET (same coordinate, higher
    * cut). Weights outside [0,1] are a caller bug (clamp first).
    *
    * Scale: one narrow filter — zero shuffle, zero driver state; the
    * weight is usually itself a per-row expression (quality score), so
    * the whole op fuses into the scan's codegen stage. */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
      salt: String = "s0"): DataFrame =
    df.withColumn("__wq", floor(weight * 10000 + lit(0.5)).cast("long"))
      .withColumn("__u", conv(substring(coord(key, salt), 1, 12), 16, 10).cast("long"))
      .filter(col("__u") < expr("(__wq * 281474976710656) div 10000"))
      .drop("__wq", "__u")

  def temperatureSampleFast(df: DataFrame, key: Column, source: Column,
      alpha: Double, keepRatio: Double, salt: String = "s0"): DataFrame = {
    val tgt = temperatureTargets(df, source, alpha, keepRatio)
    val qs = floor(lit(1000000000.0) * col("__t").cast("double")
      / col("__n").cast("double") + lit(0.5))
    val thr = tgt.select(col("__src"),
      floor(lit(281474976710656.0) * qs.cast("double") / lit(1000000000.0))
        .cast("long").as("__thr"))
    val u = conv(substring(coord(key, salt), 1, 12), 16, 10).cast("long")
    df.join(broadcast(thr), source === col("__src"))
      .filter(u < col("__thr"))
      .drop("__src", "__thr")
  }

  /** Per-HOST document cap — the crawl-politeness / SEO-spam guard
    * every web-scale curation pipeline runs (C4, RefinedWeb, Dolma all
    * cap per-domain mass): keep at most `k` documents per host, best
    * first by `orderCols` (ties must be broken to a total order — pass
    * a unique id last).
    *
    * Scale shape: the naive form windows the WHOLE corpus by host. On a
    * crawl, almost every host is under the cap — so this computes the
    * per-host counts first (one map-side-combined aggregate), lets
    * under-cap hosts pass WHOLESALE via a broadcast-able anti-join
    * (no window, no per-host sort), and ranks only the over-cap
    * minority. The expensive window touches O(docs on offending hosts),
    * not O(corpus) — at 100 TB that is the difference between sorting
    * the web and sorting its spam. The over-cap host list is
    * O(distinct offending hosts) and broadcast both ways. */
  def hostCap(df: DataFrame, host: Column, orderCols: Seq[Column],
      k: Int): DataFrame = {
    require(k >= 1, s"host cap must be >= 1, got $k")
    // NULL hosts (unparseable URLs) form ONE capped group, exactly like
    // the naive window's NULL partition — the sentinel keeps the
    // equi-join split from silently exempting them (a NULL join key
    // matches nothing, so every NULL row would pass the anti-join
    // uncapped: an uncapped spam channel). The sentinel leads with an
    // ESCAPED NUL — no parsed hostname can contain it — written as
    // the unicode escape so this file stays text to grep/diff tooling.
    val tagged = df.withColumn("__host",
      coalesce(host.cast("string"), lit("\u0000null-host")))
    val over = tagged.groupBy("__host").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > k).select("__host")
    val pass = tagged.join(broadcast(over), Seq("__host"), "left_anti")
    val ranked = Windows.topNPerGroup(
        tagged.join(broadcast(over), Seq("__host"), "left_semi"),
        Seq(col("__host")), orderCols, k, "__rn")
      .drop("__rn")
    pass.unionByName(ranked).drop("__host")
  }
}

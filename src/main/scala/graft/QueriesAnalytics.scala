package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Num.r4
import graft.functions.VectorOps
import graft.operators.{BloomJoin, Clustering, Pca, RangeJoin, Relational, Temporal}

/** Round-3 additions: temporal analytics (resample / SCD-2 history /
  * funnel), scale-path joins (Bloom-prefiltered semi, bucketed interval
  * self-join), deterministic reservoir-style sampling, and embedding
  * quantization. Conventions per SURVEY.md §7.4 (total ORDER BY, r4 on
  * doubles, BIGINT-ns event timestamps ↔ `epoch_ns(ts)`).
  */
object QueriesAnalytics {

  private type Q = (SparkSession, String) => DataFrame

  /** 6 hours in microseconds — the resample grid step over `events.ts`
    * (µs domain on both sides per SURVEY.md §7.4: DuckDB's Parquet reader
    * truncates NANOS to µs). */
  private val BucketUs = 21600000000L

  /** ts_resample: per-user 6-hour grid with forward-filled bucket sums —
    * the gap-filling resample every time-series dashboard needs. Grid is
    * generated per user over [min,max] observed buckets (narrow explode);
    * the fill window partitions by user. One exchange on user_id total. */
  val tsResample: Q = (s, dir) =>
    Temporal.resampleFill(Tables.events(s, dir), "user_id",
        // exact integral ns→µs→bucket (div is long division — no double
        // roundoff at 1e18 magnitudes)
        expr(s"(ts div 1000) div $BucketUs"),
        col("value"), v => r4(sum(v)))
      .orderBy("user_id", "b")

  val tsResampleSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 21600000000 AS b, value FROM events),
      |obs AS (
      |  SELECT user_id, b, floor(sum(value) * 10000 + 0.5) / 10000 AS v
      |  FROM e GROUP BY user_id, b),
      |grid AS (
      |  SELECT user_id, unnest(range(min(b), max(b) + 1)) AS b
      |  FROM e GROUP BY user_id)
      |SELECT g.user_id, g.b,
      |  last_value(o.v IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.b
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
      |FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b
      |ORDER BY g.user_id, g.b""".stripMargin

  /** ts_ewma: truncated dyadic EWMA over each user's dense 6-hour
    * activity-count series ([[graft.operators.Temporal.ewmaDyadic]];
    * α=1/2, 16 lags, zero-primed) — the smoothing baseline beside
    * `ts_anomaly`'s z-scores. Counts × power-of-two weights make the
    * scaled sum exact LONG arithmetic and the single ÷2¹⁶ exact IEEE,
    * so the engines agree bit-for-bit with NO rounding grid; the oracle
    * runs the identical 16 lag terms over the same dense grid. */
  val tsEwma: Q = (s, dir) =>
    Temporal.ewmaDyadic(Tables.events(s, dir), "user_id",
        expr(s"(ts div 1000) div $BucketUs"), lags = 16)
      .orderBy("user_id", "b")

  val tsEwmaSql: String = {
    val terms = (0 until 16)
      .map(k => s"coalesce(lag(x, $k) OVER w, 0) * ${1L << (15 - k)}")
      .mkString(" + ")
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) // 21600000000 AS b FROM events),
       |obs AS (SELECT user_id, b, count(*) AS x FROM e GROUP BY user_id, b),
       |grid AS (SELECT user_id, unnest(range(min(b), max(b) + 1)) AS b
       |  FROM e GROUP BY user_id),
       |dense AS (SELECT g.user_id, g.b, coalesce(o.x, 0) AS x
       |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b)
       |SELECT user_id, b, CAST($terms AS DOUBLE) / 65536.0 AS ewma
       |FROM dense
       |WINDOW w AS (PARTITION BY user_id ORDER BY b)
       |ORDER BY user_id, b""".stripMargin
  }

  /** ts_interpolate: the linear-interpolation resample
    * ([[graft.operators.Temporal.resampleInterp]]) over the same
    * per-user 6-hour grid as `ts_resample` — gaps take the straight
    * line between surrounding observations instead of the carried
    * state. Observed bucket sums are r4-rounded BEFORE interpolating on
    * both sides, and the interpolation expression is mirrored token for
    * token, so the engines run the identical IEEE chain. */
  val tsInterpolate: Q = (s, dir) =>
    Temporal.resampleInterp(Tables.events(s, dir), "user_id",
        expr(s"(ts div 1000) div $BucketUs"),
        col("value"), v => r4(sum(v)))
      .select(col("user_id"), col("b"), r4(col("v_interp")).as("v_interp"))
      .orderBy("user_id", "b")

  val tsInterpolateSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 21600000000 AS b, value FROM events),
      |obs AS (
      |  SELECT user_id, b, floor(sum(value) * 10000 + 0.5) / 10000 AS v
      |  FROM e GROUP BY user_id, b),
      |grid AS (
      |  SELECT user_id, unnest(range(min(b), max(b) + 1)) AS b
      |  FROM e GROUP BY user_id),
      |j AS (
      |  SELECT g.user_id, g.b, o.v,
      |    CASE WHEN o.v IS NOT NULL
      |      THEN struct_pack(ob := g.b, ov := o.v) END AS ostr
      |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b),
      |w AS (
      |  SELECT user_id, b, v,
      |    last_value(ostr IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
      |    first_value(ostr IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
      |  FROM j)
      |SELECT user_id, b,
      |  floor((CASE WHEN v IS NOT NULL THEN v
      |    ELSE p.ov + (n.ov - p.ov) *
      |      (CAST(b - p.ob AS DOUBLE) / CAST(n.ob - p.ob AS DOUBLE)) END)
      |    * 10000 + 0.5) / 10000 AS v_interp
      |FROM w ORDER BY user_id, b""".stripMargin

  /** scd2_intervals: run-length event-type history per user — the SCD-2
    * validity-interval build ([eff_from, eff_to), NULL-open tail).
    * Timestamps in the µs domain on both sides (§7.4). */
  val scd2Intervals: Q = (s, dir) =>
    Temporal.scd2(Tables.events(s, dir), "user_id",
        expr("ts div 1000"), col("event_id"), col("event_type"))
      .select(col("user_id"), col("run"), col("attr").as("event_type"),
        col("eff_from"), col("eff_to"), col("n_rows"))
      .orderBy("user_id", "run")

  val scd2IntervalsSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS ts, event_id, event_type,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |r AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
      |  FROM e),
      |runs AS (
      |  SELECT user_id, run, min(event_type) AS event_type,
      |    min(ts) AS eff_from, count(*) AS n_rows
      |  FROM r GROUP BY user_id, run)
      |SELECT user_id, run, event_type, eff_from,
      |  lead(eff_from) OVER (PARTITION BY user_id ORDER BY run) AS eff_to,
      |  n_rows
      |FROM runs ORDER BY user_id, run""".stripMargin

  /** scd2_incremental: incremental SCD-2 maintenance
    * ([[graft.operators.Temporal.scd2ApplyDelta]]) — the stored interval
    * table (built from the pre-Jan-16 half) plus the later half as a
    * delta batch, WITHOUT re-reading base events: closed intervals ship
    * through untouched, each affected user's open interval extends or
    * closes against one synthetic row + its delta events. The oracle is
    * the FULL-history scd2 rebuild — the IVM identity itself is the
    * gate, the `rollup_incremental` trick applied to dimension
    * history. */
  val scd2Incremental: Q = (s, dir) => {
    val cutUs = 1705363200000000L // 2024-01-16T00:00Z in µs
    val ev = Tables.events(s, dir)
    val base = ev.filter(expr("ts div 1000") < cutUs)
    val delta = ev.filter(expr("ts div 1000") >= cutUs)
    val baseIv = Temporal.scd2(base, "user_id",
      expr("ts div 1000"), col("event_id"), col("event_type"))
    Temporal.scd2ApplyDelta(baseIv, delta, "user_id",
        expr("ts div 1000"), col("event_id"), col("event_type"))
      .select(col("user_id"), col("run"), col("attr").as("event_type"),
        col("eff_from"), col("eff_to"), col("n_rows"))
      .orderBy("user_id", "run")
  }

  // the gate IS the IVM identity: DuckDB rebuilds from the full history
  val scd2IncrementalSql: String = scd2IntervalsSql

  /** ts_rolling_slope: trailing-8-bucket OLS slope of each user's dense
    * 6-hour count series ([[graft.operators.Temporal.rollingSlope]]) —
    * the LOCAL "volume is accelerating" detector beside
    * `ts_double_ewma`'s smoothed trend. All five OLS sums are BIGINT
    * frame sums; slope is one r8 IEEE division of exact integers. */
  val tsRollingSlope: Q = (s, dir) =>
    Temporal.rollingSlope(Tables.events(s, dir), "user_id",
        expr(s"(ts div 1000) div $BucketUs"))
      .orderBy("user_id", "b")

  val tsRollingSlopeSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 21600000000 AS b FROM events),
      |obs AS (SELECT user_id, b, count(*) AS y FROM e GROUP BY user_id, b),
      |grid AS (SELECT user_id, unnest(range(min(b), max(b) + 1)) AS b
      |  FROM e GROUP BY user_id),
      |dense AS (SELECT g.user_id, g.b, coalesce(o.y, 0) AS y
      |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b),
      |f AS (SELECT user_id, b, CAST(y AS BIGINT) AS y,
      |    CAST(count(*) OVER w AS BIGINT) AS n,
      |    CAST(sum(b) OVER w AS BIGINT) AS sx,
      |    CAST(sum(y) OVER w AS BIGINT) AS sy,
      |    CAST(sum(b * y) OVER w AS BIGINT) AS sxy,
      |    CAST(sum(b * b) OVER w AS BIGINT) AS sxx
      |  FROM dense
      |  WINDOW w AS (PARTITION BY user_id ORDER BY b
      |    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
      |SELECT user_id, b, y, n,
      |  CAST(n * sxy - sx * sy AS BIGINT) AS num,
      |  CAST(n * sxx - sx * sx AS BIGINT) AS den,
      |  CASE WHEN n * sxx - sx * sx > 0 THEN
      |    floor(CAST(n * sxy - sx * sy AS DOUBLE)
      |      / CAST(n * sxx - sx * sx AS DOUBLE) * 100000000 + 0.5) / 100000000
      |  ELSE 0.0 END AS slope
      |FROM f ORDER BY user_id, b""".stripMargin

  /** funnel_steps: signup → first-purchase-after conversion funnel over
    * the whole fixture — two co-partitioned aggregations + one summary
    * row (counts + r4 mean hours-to-convert). */
  val funnelSteps: Q = (s, dir) =>
    Temporal.funnel(Tables.events(s, dir), "user_id",
        expr("ts div 1000"), col("event_type"), "signup", "purchase")
      .agg(count(lit(1)).as("n_signup_users"),
        count(col("b_ts")).as("n_converted"),
        r4(avg((col("b_ts") - col("a_ts")) / lit(3.6e9))).as("avg_hours_to_convert"))

  val funnelStepsSql =
    """WITH a AS (
      |  SELECT user_id, min(epoch_us(ts)) AS a_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |b AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS b_ts
      |  FROM events e JOIN a ON e.user_id = a.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > a.a_ts
      |  GROUP BY e.user_id)
      |SELECT count(*) AS n_signup_users, count(b.b_ts) AS n_converted,
      |  floor((avg((b.b_ts - a.a_ts) / 3600000000.0)) * 10000 + 0.5) / 10000
      |    AS avg_hours_to_convert
      |FROM a LEFT JOIN b ON a.user_id = b.user_id""".stripMargin

  /** ts_anomaly: event-volume anomaly scoring — hourly bucket counts per
    * event_type, each bucket z-scored against its type's own bucket
    * distribution ([[Temporal.volumeAnomaly]]). Moments are exact
    * integer sums and the zero-variance guard is an integer predicate,
    * so the only float arithmetic is one fixed IEEE chain per row —
    * DuckDB reproduces it bit-for-bit from the same integers. */
  val tsAnomaly: Q = (s, dir) =>
    Temporal.volumeAnomaly(Tables.events(s, dir),
        col("event_type"), expr("(ts div 1000) div 3600000000"))
      .withColumnRenamed("grp", "event_type")
      .orderBy("event_type", "bucket")

  val tsAnomalySql =
    """WITH b AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS bucket,
      |    count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(n_events) AS BIGINT) AS sc,
      |    CAST(sum(n_events * n_events) AS BIGINT) AS scc
      |  FROM b GROUP BY 1)
      |SELECT b.event_type, b.bucket, b.n_events,
      |  CASE WHEN s.n * s.scc - s.sc * s.sc > 0
      |    THEN floor(((CAST(b.n_events AS DOUBLE)
      |        - CAST(s.sc AS DOUBLE) / CAST(s.n AS DOUBLE))
      |      / sqrt((CAST(s.scc AS DOUBLE)
      |          - CAST(s.sc AS DOUBLE) * CAST(s.sc AS DOUBLE) / CAST(s.n AS DOUBLE))
      |        / CAST(s.n AS DOUBLE))) * 10000 + 0.5) / 10000
      |    ELSE 0.0 END AS z
      |FROM b JOIN s USING (event_type)
      |ORDER BY event_type, bucket""".stripMargin

  /** ts_changepoint: CUSUM level-shift detection — per event_type, the
    * hourly-count series' max-|CUSUM| bucket
    * ([[Temporal.cusumChangepoint]]). The companion alarm to
    * [[tsAnomaly]]: z-scores flag outlier BUCKETS, CUSUM estimates the
    * single break POINT (max-type test / least-squares break
    * estimator). The statistic is the scaled integer n·S_t =
    * n·prefix_t − t·total, so group totals, argmax, and tie-break
    * (earliest bucket) are all BIGINT-exact cross-engine. */
  val tsChangepoint: Q = (s, dir) =>
    Temporal.cusumChangepoint(Tables.events(s, dir),
        col("event_type"), expr("(ts div 1000) div 3600000000"))
      .withColumnRenamed("grp", "event_type")
      .orderBy("event_type")

  val tsChangepointSql =
    """WITH b AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS bucket,
      |    count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT event_type, bucket,
      |    row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS t,
      |    CAST(sum(x) OVER (PARTITION BY event_type ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS prefix
      |  FROM b),
      |s AS (
      |  SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS total
      |  FROM b GROUP BY 1),
      |sc AS (
      |  SELECT p.event_type, p.bucket, s.n, s.total,
      |    abs(s.n * p.prefix - p.t * s.total) AS stat
      |  FROM p JOIN s USING (event_type))
      |SELECT event_type, cp_bucket, cusum, n_buckets, total_events FROM (
      |  SELECT event_type, bucket AS cp_bucket, CAST(stat AS BIGINT) AS cusum,
      |    n AS n_buckets, total AS total_events,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY stat DESC, bucket ASC) AS rn
      |  FROM sc) WHERE rn = 1
      |ORDER BY event_type""".stripMargin

  /** ts_seasonal: hour-of-day seasonal decomposition of hourly
    * event-type volumes ([[Temporal.seasonalResiduals]], period 24) —
    * seasonal mean + residual per bucket, the deseasonalization step
    * raw z-scores miss (a 3 a.m. lull is normal; a 3 a.m. spike isn't).
    * Seasonal and residual are each ONE IEEE division of exact LONGs on
    * the 1e-8 grid. */
  val tsSeasonal: Q = (s, dir) =>
    Temporal.seasonalResiduals(Tables.events(s, dir),
        col("event_type"), expr("(ts div 1000) div 3600000000"), period = 24)
      .withColumnRenamed("grp", "event_type")
      .orderBy("event_type", "bucket")

  val tsSeasonalSql =
    """WITH b AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS bucket,
      |    count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |p AS (SELECT *, bucket % 24 AS phase FROM b),
      |prof AS (
      |  SELECT event_type, phase, count(*) AS n_h,
      |    CAST(sum(n_events) AS BIGINT) AS tot_h
      |  FROM p GROUP BY 1, 2)
      |SELECT p.event_type, p.bucket, p.phase, p.n_events,
      |  floor((CAST(prof.tot_h AS DOUBLE) / CAST(prof.n_h AS DOUBLE))
      |    * 100000000 + 0.5) / 100000000 AS seasonal,
      |  floor((CAST(p.n_events * prof.n_h - prof.tot_h AS DOUBLE)
      |      / CAST(prof.n_h AS DOUBLE)) * 100000000 + 0.5) / 100000000 AS resid
      |FROM p JOIN prof ON prof.event_type = p.event_type AND prof.phase = p.phase
      |ORDER BY p.event_type, p.bucket""".stripMargin

  /** retention_cohorts: classic cohort retention over `events` — cohort =
    * the DAY of a user's first purchase, retention(k) = the share of that
    * cohort purchasing again k days later. THE product-analytics staple
    * next to [[funnelSteps]] (daily grain on the conversion event keeps
    * the fixture's retention curve non-degenerate: 0.08–1.0 measured).
    *
    * Scale shape: the event-type filter pushes to the scan; activity
    * collapses to distinct (user, day) with map-side partials; the
    * first-day aggregate is co-keyed on user_id with that frame; and
    * everything after the user-keyed join is O(cohorts × days) — a few
    * hundred rows at any corpus size. Days are integer floor-division of
    * the BIGINT-ns timestamp, so the oracle reproduces buckets exactly
    * (no calendar functions, no timezone). */
  val retentionCohorts: Q = (s, dir) => {
    val dayNs = 86400000000000L // 24 * 3600 * 1e9
    val uw = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr(s"ts div ${dayNs}L").as("day"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = cohort.groupBy("cohort_day").agg(count(lit(1)).as("cohort_users"))
    uw.join(cohort, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(sizes, "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("active_users"), col("cohort_users"),
        r4(col("active_users") / col("cohort_users")).as("retention"))
      .orderBy("cohort_day", "day_offset")
  }

  val retentionCohortsSql =
    """WITH uw AS (SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
      |            FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, min(day) AS cohort_day FROM uw GROUP BY user_id),
      |sizes AS (SELECT cohort_day, count(*) AS cohort_users FROM c GROUP BY cohort_day),
      |act AS (SELECT c.cohort_day, uw.day - c.cohort_day AS day_offset,
      |               count(*) AS active_users
      |        FROM uw JOIN c USING (user_id) GROUP BY 1, 2)
      |SELECT a.cohort_day, a.day_offset, a.active_users, s.cohort_users,
      |  floor((a.active_users * 1.0 / s.cohort_users) * 10000 + 0.5) / 10000 AS retention
      |FROM act a JOIN sizes s USING (cohort_day) ORDER BY cohort_day, day_offset""".stripMargin

  /** sample_reservoir: deterministic k-uniform sample as smallest-k by
    * content hash — the distributed equivalent of reservoir sampling
    * (per-partition k-heaps + driver merge of k, via
    * TakeOrderedAndProject; never a full sort, never a full collect).
    * Unlike rand()-based sampling it is partition- and retry-stable, and
    * any engine draws the identical sample — which is what makes it
    * oracle-checkable at all. */
  val sampleReservoir: Q = (s, dir) =>
    Relational.topK(
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .withColumn("h", md5(concat_ws("-", col("l_orderkey"), col("l_linenumber")))),
      // (l_orderkey, l_linenumber) is NOT unique in the fixture (measured:
      // 11 785 duplicate pairs at sf0.01) — the price tie-break makes the
      // order total ((okey, lnum, price) is unique at every SF)
      200, col("h").asc, col("l_extendedprice").asc)

  val sampleReservoirSql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice,
      |  md5(concat(CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR))) AS h
      |FROM lineitem
      |ORDER BY h, l_extendedprice LIMIT 200""".stripMargin

  /** join_bloom: orders of BUILDING-segment customers via a Bloom
    * pre-filter + exact semi-join. Result-identical to the plain
    * semi-join (its SQL is the oracle); the sketch pass is the 100 TB
    * fact-to-huge-dim shape — see BloomJoin.semiWithBloom. Expected-item
    * count is a generous fixed bound (≤ customer table size), not a
    * data-dependent count() pass: oversizing a Bloom filter only wastes
    * bits, never correctness. */
  val joinBloom: Q = (s, dir) => {
    val dim = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    BloomJoin.semiWithBloom(
        Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
        "o_custkey", dim, "c_custkey", expectedItems = 20000L)
      .orderBy("o_orderkey")
  }

  val joinBloomSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |ORDER BY o_orderkey""".stripMargin

  /** join_interval_bucketed: overlap self-join of 7-day order windows
    * with NO equi key (across customers), as a bucketed equi-join —
    * weekly co-occurrence counts of big urgent orders. The oracle is the
    * plain non-equi self-join; the engine never runs O(n²): intervals
    * replicate to ≤ 2 week-buckets each and meet only inside a bucket
    * (RangeJoin.overlapSelfBucketed keeps exactly the canonical bucket,
    * so no distinct pass is needed). */
  /** join_box_2d: 2-D ε-range self-join on part
    * ([[graft.operators.BoxJoin.selfJoin2d]]): all pairs with
    * |Δretailprice| ≤ 2.0 AND |Δsize| ≤ 1 — the two-simultaneous-
    * dimensions range join a sort-merge band cannot bound; grid-cell
    * decomposition (3×3 neighborhood replication) keeps candidate mass
    * Σ 9·|cell|², dup-free without distinct. The oracle is the naive
    * theta self-join (DuckDB's IEJoin handles it at fixture scale). */
  val joinBox2d: Q = (s, dir) =>
    graft.operators.BoxJoin.selfJoin2d(Tables.part(s, dir),
        "p_partkey", "p_retailprice", "p_size", epsX = 2.0, epsY = 1.0)
      .orderBy("a_id", "b_id")

  val joinBox2dSql =
    """SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
      |  abs(a.p_retailprice - b.p_retailprice) AS dx,
      |  abs(CAST(a.p_size AS DOUBLE) - CAST(b.p_size AS DOUBLE)) AS dy
      |FROM part a JOIN part b
      |  ON a.p_partkey < b.p_partkey
      | AND abs(a.p_retailprice - b.p_retailprice) <= 2.0
      | AND abs(CAST(a.p_size AS DOUBLE) - CAST(b.p_size AS DOUBLE)) <= 1.0
      |WHERE a.p_retailprice IS NOT NULL AND a.p_size IS NOT NULL
      |  AND b.p_retailprice IS NOT NULL AND b.p_size IS NOT NULL
      |ORDER BY a_id, b_id""".stripMargin

  val joinIntervalBucketed: Q = (s, dir) => {
    val base = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 400000)
      .select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("sd"))
    RangeJoin.overlapSelfBucketed(base, "o_orderkey", "sd", len = 7, bucket = 7)
      .groupBy(floor(greatest(col("a_sd"), col("b_sd")) / 7).as("wk"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("wk")
  }

  val joinIntervalBucketedSql =
    """WITH base AS (
      |  SELECT o_orderkey,
      |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS sd
      |  FROM orders
      |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000)
      |SELECT CAST(floor(greatest(a.sd, b.sd) / 7.0) AS BIGINT) AS wk,
      |  count(*) AS n_pairs
      |FROM base a JOIN base b
      |  ON a.o_orderkey < b.o_orderkey AND a.sd < b.sd + 7 AND b.sd < a.sd + 7
      |GROUP BY wk ORDER BY wk""".stripMargin

  /** vec_quantize_int8: per-vector symmetric int8 quantization of the
    * embedding column — scale = max|x|/127, codes = half-up(x/scale).
    * Projected as (scale, code sum/min/max) so the oracle compares
    * scalars; the arithmetic is pure IEEE double, bit-identical across
    * engines. Narrow per-row pass, zero shuffle. */
  val vecQuantizeInt8: Q = (s, dir) => {
    // materialize the scale ONCE per row: inlining the absMax aggregate
    // into the transform lambda would re-evaluate it per ELEMENT (64×
    // redundant work — measured 1.8 s → 0.3 s at sf0.1)
    Tables.embeddings(s, dir)
      .withColumn("scl", VectorOps.int8Scale(col("embedding")))
      .withColumn("qv", VectorOps.quantizeInt8(col("embedding"), col("scl")))
      .select(col("vec_id"), r4(col("scl")).as("scale4"),
        aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("q_sum"),
        array_min(col("qv")).as("q_min"),
        array_max(col("qv")).as("q_max"))
      .orderBy("vec_id")
  }

  val vecQuantizeInt8Sql =
    """WITH a AS (
      |  SELECT vec_id, embedding,
      |    greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
      |      1e-300) AS amax
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, amax / 127.0 AS scl,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) / (amax / 127.0) + 0.5) AS BIGINT)) AS qv
      |  FROM a)
      |SELECT vec_id, floor(scl * 10000 + 0.5) / 10000 AS scale4,
      |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
      |  CAST(list_min(qv) AS BIGINT) AS q_min,
      |  CAST(list_max(qv) AS BIGINT) AS q_max
      |FROM q ORDER BY vec_id""".stripMargin

  /** vec_project_rp: Johnson–Lindenstrauss sign random projection 64→8
    * dims ([[VectorOps.projectRp]]) — the dimensionality-reduction
    * prelude to cheaper ANN/clustering. Each component is one codegen'd
    * dot against a literal ±1 vector (zero shuffle, pure scan); the
    * deterministic MD5-derived sign matrix is rendered into the oracle
    * as the identical literal, so DuckDB evaluates the same signed sum
    * in the same order. */
  val vecProjectRp: Q = (s, dir) => {
    val proj = VectorOps.projectRp(col("embedding"), 8, 64)
    Tables.embeddings(s, dir)
      .select(col("vec_id") +:
        proj.zipWithIndex.map { case (c, j) => r4(c).as(s"p$j") }: _*)
      .orderBy("vec_id")
  }

  val vecProjectRpSql = {
    val comps = VectorOps.rpSigns(8, 64).zipWithIndex.map { case (row, j) =>
      val arr = row.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
      s"  floor((list_sum(list_transform(range(1, 65), " +
        s"i -> CAST(embedding[i] AS DOUBLE) * ($arr)[i]))) * 10000 + 0.5) / 10000 AS p$j"
    }.mkString(",\n")
    s"SELECT vec_id,\n$comps\nFROM embeddings ORDER BY vec_id"
  }

  /** vec_centroids: per-source embedding centroids — the group-level
    * vector summary behind IVF seeding, source drift monitoring, and
    * diversity audits. Shape: posexplode to (source, dim, value) rows
    * and ONE map-side-combined aggregate — the explode mass reduces to
    * sources × dims per partition before the exchange. Determinism:
    * components are quantized to integer micro-units BEFORE summing
    * (exact long arithmetic under any merge order — the float-sum
    * accumulation-order trap of [[graft.operators.Graph]]'s pagerank,
    * §7.4), one final division per cell. */
  val vecCentroids: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
      .join(Tables.documents(s, dir).select(col("doc_id"), col("source")),
        col("vec_id") === col("doc_id"))
    emb.select(col("source"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("source"), (col("pos") + 1).as("dim"),
        floor(col("x").cast("double") * 1000000 + 0.5).cast("long").as("qi"))
      .groupBy("source", "dim")
      .agg(count(lit(1)).as("n_vecs"),
        r4(sum(col("qi")) / (count(lit(1)) * 1000000.0)).as("c"))
      .orderBy("source", "dim")
  }

  val vecCentroidsSql =
    """SELECT d.source, t.i AS dim, count(*) AS n_vecs,
      |  floor((CAST(sum(CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / (count(*) * 1000000.0)) * 10000 + 0.5) / 10000 AS c
      |FROM embeddings e
      |JOIN documents d ON e.vec_id = d.doc_id
      |CROSS JOIN range(1, 65) t(i)
      |GROUP BY d.source, t.i
      |ORDER BY d.source, t.i""".stripMargin

  /** cluster_kmeans: exact fixed-round Lloyd k-means assignments over
    * the embeddings table ([[graft.operators.Clustering.kmeansExact]];
    * k=4, 2 update rounds, k-smallest-id seeds). Every distance and
    * centroid update is exact integer arithmetic on the 10⁻⁶ grid, so
    * DuckDB can recompute the ENTIRE iteration — seeds, both Lloyd
    * updates (with the empty-cluster keep rule), and the final argmin
    * with its (d2, cl) tie-break — as unrolled CTEs, the same gating
    * trick as `graph_pagerank`'s six unrolled rounds. */
  val clusterKmeans: Q = (s, dir) =>
    Clustering.kmeansExact(Tables.embeddings(s, dir), k = 4, rounds = 2)

  /** The shared k-means CTE chain (seeds → unrolled assign/update rounds
    * → final assignment `a{rounds+1}`) — the oracle body both
    * `cluster_kmeans` and `curate_cluster_balance` build on. */
  /** The exact-Lloyd CTE chain. `p` prefixes every CTE name and
    * `dimLo..dimHi` (1-based, inclusive) restricts the embedding slice,
    * so multiple independent chains — one per PQ subspace — compose in
    * one WITH; the defaults reproduce the full-vector chain verbatim. */
  private def kmeansCtes(k: Int, rounds: Int, p: String = "",
      dimLo: Int = 1, dimHi: Int = 64): String = {
    // assignment i against centroid table c{i-1}: exact BIGINT d2,
    // argmin with the (d2, cl) tie-break
    def assign(i: Int): String =
      s"""${p}d$i AS (SELECT q.vec_id, c.cl, sum((q.qx - c.c) * (q.qx - c.c)) AS d2
         |  FROM ${p}q q JOIN ${p}c${i - 1} c ON q.dim = c.dim GROUP BY q.vec_id, c.cl),
         |${p}a$i AS (SELECT vec_id, cl, d2 FROM (
         |    SELECT vec_id, cl, d2,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
         |    FROM ${p}d$i) WHERE rn = 1)""".stripMargin
    // update i: re-quantized means in PURE BIGINT — round-half-up as
    // (2·Σx + n) floor-div (2n), floor division spelled as
    // subtract-mod-then-exact-// (num − pmod(num,den) is exactly
    // divisible, so truncating and floor division coincide). No double
    // exists in the chain — the round-9 driver flake's `.5` boundary
    // is structurally gone (mirrors Clustering.trainCentroids).
    def update(i: Int): String =
      s"""${p}n$i AS (SELECT cl, dim,
         |    (num - (((num % den) + den) % den)) // den AS c
         |  FROM (SELECT a.cl, q.dim,
         |      2 * sum(q.qx) + count(*) AS num, 2 * count(*) AS den
         |    FROM ${p}a$i a JOIN ${p}q q ON q.vec_id = a.vec_id
         |    GROUP BY a.cl, q.dim)),
         |${p}c$i AS (SELECT p.cl, p.dim, COALESCE(n.c, p.c) AS c
         |  FROM ${p}c${i - 1} p LEFT JOIN ${p}n$i n ON n.cl = p.cl AND n.dim = p.dim)""".stripMargin
    val body = (1 to rounds).map(i => assign(i) + ",\n" + update(i)).mkString(",\n")
    s"""${p}q AS (
       |  SELECT e.vec_id, t.i AS dim,
       |    CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qx
       |  FROM embeddings e CROSS JOIN range($dimLo, ${dimHi + 1}) t(i)),
       |${p}seeds AS (SELECT vec_id, cl FROM (
       |    SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS cl FROM embeddings)
       |  WHERE cl <= $k),
       |${p}c0 AS (SELECT s.cl, q.dim, q.qx AS c
       |  FROM ${p}seeds s JOIN ${p}q q ON q.vec_id = s.vec_id),
       |$body,
       |${assign(rounds + 1)}""".stripMargin
  }

  /** Final-select type hardening (round 11, VERDICT r10 ask #1): DuckDB
    * `sum(BIGINT)` returns HUGEINT, and a driver DuckDB/fetch path that
    * surfaces HUGEINT as float64 stringifies it at 10 significant
    * digits while Spark's BIGINT prints exact — rows/schema green, hash
    * red, precisely `cluster_kmeans`'s two-round driver signature
    * (local DuckDB 1.0.0 fetchall() returns Python int and passes,
    * which is why the divergence never reproduced here). Every compared
    * column that is a sum/`//` product now carries an explicit
    * `CAST(... AS BIGINT)`; values fit comfortably (d2 ≤ 64·(2·10⁶)² ≈
    * 2.6·10¹⁴). tools/audit_oracle_types.py sweeps all oracles for the
    * same hazard. */
  val clusterKmeansSql: String =
    s"""WITH ${kmeansCtes(4, 2)}
       |SELECT vec_id, cl AS cluster, CAST(d2 AS BIGINT) AS d2
       |FROM a3 ORDER BY vec_id""".stripMargin

  /** cluster_kmeans_centroids: DIAGNOSTIC SIBLING #1 (VERDICT r10 ask
    * #1 — bisect, don't re-guess): the trained k·dims=256-row centroid
    * table after both Lloyd rounds, gated on the oracle chain's `c2`.
    * If `cluster_kmeans` stays red while this row is green, the
    * training loop agrees cross-engine and the divergence lives in the
    * final assignment/d2 enumeration; if THIS row is red, the
    * divergence is inside the update arithmetic. Either way
    * CORRECTNESS_r11 localizes the stage. */
  val clusterKmeansCentroids: Q = (s, dir) => {
    val cs = Clustering.trainCentroids(Tables.embeddings(s, dir), k = 4, rounds = 2)
    import s.implicits._
    cs.zipWithIndex.flatMap { case (vec, i) =>
      vec.zipWithIndex.map { case (c, d) => ((i + 1).toLong, (d + 1).toLong, c) }
    }.toSeq.toDF("cl", "dim", "c").orderBy("cl", "dim")
  }

  val clusterKmeansCentroidsSql: String =
    s"""WITH ${kmeansCtes(4, 2)}
       |SELECT CAST(cl AS BIGINT) AS cl, CAST(dim AS BIGINT) AS dim,
       |  CAST(c AS BIGINT) AS c
       |FROM c2 ORDER BY cl, dim""".stripMargin

  /** cluster_kmeans_assign: DIAGNOSTIC SIBLING #2 — the final
    * assignment WITHOUT the d2 column (the only HUGEINT-typed output of
    * the original row). Green here + red on `cluster_kmeans` convicts
    * the d2 column's type canonicalization alone. */
  val clusterKmeansAssign: Q = (s, dir) =>
    Clustering.kmeansAssign(Tables.embeddings(s, dir), k = 4, rounds = 2)
      .select(col("vec_id"), col("cluster")).orderBy("vec_id")

  val clusterKmeansAssignSql: String =
    s"""WITH ${kmeansCtes(4, 2)}
       |SELECT vec_id, cl AS cluster FROM a3 ORDER BY vec_id""".stripMargin

  /** curate_semdedup: SemDeDup (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication") —
    * k-means the embeddings, then WITHIN each cluster drop every vector
    * that has a lower-id cluster-mate with cosine ≥ τ (0.35,
    * fixture-calibrated: ~0.3% of within-cluster pairs). The semantic
    * near-dup pass that text-level dedup can't see (paraphrases,
    * translations, re-renders), per the published recipe: clustering
    * first so the pair stage never leaves a cluster.
    *
    * Exactness: the cluster assignment is the gated exact-Lloyd chain
    * (`cluster_kmeans`); cosines are r4-gridded and the threshold
    * compares the ROUNDED value (§7.4); the drop rule is a pure
    * (u < v, cos ≥ τ) predicate — no CC, deterministic. Scale shape:
    * pair mass is Σ_c |c|² — the SemDeDup contract is that k SCALES
    * with the corpus (k ≈ n/target-cluster-size), holding per-cluster
    * pair mass n·|c|; the fixture's k=4 is the gate configuration, not
    * the production one. The self-join is co-keyed on the cluster id;
    * vectors ship once per side. */
  val curateSemdedup: Q = (s, dir) => {
    import graft.functions.VectorOps
    val emb = Tables.embeddings(s, dir)
    val asn = Clustering.kmeansAssign(emb, k = 4, rounds = 2)
      .select(col("vec_id"), col("cluster"))
    val withVec = asn.join(
      emb.select(col("vec_id"), col("embedding"),
        VectorOps.norm(col("embedding")).as("nrm")), "vec_id")
    val a = withVec.select(col("cluster"), col("vec_id").as("u"),
      col("embedding").as("vu"), col("nrm").as("nu"))
    val b = withVec.select(col("cluster"), col("vec_id").as("v"),
      col("embedding").as("vv"), col("nrm").as("nv"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("u") < col("v"))
      .filter(r4(VectorOps.dot(col("vu"), col("vv"))
        / (col("nu") * col("nv"))) >= 0.35)
      .select(col("v").as("vec_id")).distinct()
      .withColumn("dropped", lit(true))
    asn.join(dropped, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("dropped"), lit(false)).as("dropped"))
      .orderBy("vec_id")
  }

  val curateSemdedupSql: String =
    s"""WITH ${kmeansCtes(4, 2)},
       |asn AS (SELECT vec_id, cl FROM a3),
       |p AS (SELECT y.vec_id AS v, floor((
       |    list_sum(list_transform(range(1, 65), i -> CAST(ex.embedding[i] AS DOUBLE) * CAST(ey.embedding[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(ex.embedding, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE))))
       |       * sqrt(list_sum(list_transform(ey.embedding, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS cos
       |  FROM asn x JOIN asn y ON x.cl = y.cl AND x.vec_id < y.vec_id
       |  JOIN embeddings ex ON ex.vec_id = x.vec_id
       |  JOIN embeddings ey ON ey.vec_id = y.vec_id),
       |drp AS (SELECT DISTINCT v FROM p WHERE cos >= 0.35)
       |SELECT a.vec_id, a.cl AS cluster, (d.v IS NOT NULL) AS dropped
       |FROM asn a LEFT JOIN drp d ON d.v = a.vec_id
       |ORDER BY vec_id""".stripMargin

  /** eval_ann_recall: recall@5 of the cluster-restricted ANN against
    * the exact kNN graph — the evaluation op every production ANN
    * deployment runs BEFORE trusting approximate neighbors: candidates
    * limited to each query's exact-Lloyd k-means cell (the
    * `curate_semdedup`/IVF coarse-quantizer shape), top-5 by r4 cosine,
    * scored against `sim_knn_exact`'s truth. One row:
    * (n_queries, n_true, n_hit, recall).
    *
    * Exactness: both sides are already-gated machinery (the exact-Lloyd
    * chain; the r4-cosine deterministic (cosine desc, dst) rank); hits
    * are an integer semi-join count and recall is ONE r8 IEEE division.
    * The exact side is the DECLARED O(n²) baseline — at production this
    * audit runs on a query SAMPLE (the standard recall protocol), not
    * the corpus. */
  val evalAnnRecall: Q = (s, dir) => {
    import graft.functions.VectorOps
    import graft.operators.Similarity
    val W = org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir)
    val asn = Clustering.kmeansAssign(emb, k = 4, rounds = 2)
      .select(col("vec_id"), col("cluster"))
    val withVec = asn.join(
      emb.select(col("vec_id"), col("embedding"),
        VectorOps.norm(col("embedding")).as("nrm")), "vec_id")
    val a = withVec.select(col("cluster"), col("vec_id").as("src"),
      col("embedding").as("vs"), col("nrm").as("ns"))
    val b = withVec.select(col("cluster"), col("vec_id").as("dst"),
      col("embedding").as("vd"), col("nrm").as("nd"))
    val w = W.partitionBy("src").orderBy(col("cosine").desc, col("dst").asc)
    val ann = a.join(b, Seq("cluster")).filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        r4(VectorOps.dot(col("vs"), col("vd")) / (col("ns") * col("nd")))
          .as("cosine"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select("src", "dst")
    // ONE pass over the exact side (round 15): the old totals aggregate
    // + hit semi-join + crossJoin evaluated the declared-O(n²) exact
    // baseline twice; a left-outer hit marker folds totals and hits
    // into a single aggregate over one evaluation (ann pairs are unique,
    // so count(h) ≡ the semi-join count)
    val exact = Similarity.knnGraphExact(emb, 5).select("src", "dst")
    exact.join(ann.withColumn("__h", lit(1)), Seq("src", "dst"), "left_outer")
      .agg(countDistinct("src").as("n_queries"), count(lit(1)).as("n_true"),
        count(col("__h")).as("n_hit"))
      .select(col("n_queries"), col("n_true"), col("n_hit"),
        graft.functions.Num.r8(col("n_hit").cast("double")
          / col("n_true").cast("double")).as("recall"))
  }

  val evalAnnRecallSql: String =
    s"""WITH ${kmeansCtes(4, 2)},
       |asn AS (SELECT vec_id, cl FROM a3),
       |cand AS (SELECT x.vec_id AS src, y.vec_id AS dst, floor((
       |    list_sum(list_transform(range(1, 65), i -> CAST(ex.embedding[i] AS DOUBLE) * CAST(ey.embedding[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(ex.embedding, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE))))
       |       * sqrt(list_sum(list_transform(ey.embedding, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS cosine
       |  FROM asn x JOIN asn y ON x.cl = y.cl AND x.vec_id <> y.vec_id
       |  JOIN embeddings ex ON ex.vec_id = x.vec_id
       |  JOIN embeddings ey ON ey.vec_id = y.vec_id),
       |ann AS (SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src
       |      ORDER BY cosine DESC, dst) AS rk FROM cand) WHERE rk <= 5),
       |p AS (SELECT a.vec_id AS src, b.vec_id AS dst, floor((
       |    list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS cosine
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
       |exact AS (SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src
       |      ORDER BY cosine DESC, dst) AS rk FROM p) WHERE rk <= 5),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_true,
       |    CAST(count(DISTINCT src) AS BIGINT) AS n_queries FROM exact),
       |hit AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
       |  FROM exact e JOIN ann USING (src, dst))
       |SELECT tot.n_queries, tot.n_true, hit.n_hit,
       |  floor(CAST(hit.n_hit AS DOUBLE) / CAST(tot.n_true AS DOUBLE)
       |    * 100000000 + 0.5) / 100000000 AS recall
       |FROM tot CROSS JOIN hit""".stripMargin

  /** vec_pq_codes: product quantization ([[graft.operators.Pq.pqCodes]]:
    * 8 subspaces × k=4 codes, 2 Lloyd rounds each) — 64 floats → 8 small
    * codes, the IVF-PQ memory layout for billion-scale ANN. Every
    * subspace codebook is the exact-Lloyd contract, so the oracle
    * composes EIGHT independent `kmeansCtes` chains (one per dim slice)
    * and joins their final assignments. The engine encodes in ONE
    * narrow pass — all 8 codebooks are broadcast literals. */
  val vecPqCodes: Q = (s, dir) =>
    graft.operators.Pq.pqCodes(Tables.embeddings(s, dir),
      dims = 64, subspaces = 8, k = 4, rounds = 2)

  val vecPqCodesSql: String = {
    val chains = (0 until 8)
      .map(s => kmeansCtes(4, 2, p = s"s${s}_", dimLo = s * 8 + 1, dimHi = s * 8 + 8))
      .mkString(",\n")
    val joins = (1 until 8)
      .map(s => s"JOIN s${s}_a3 s$s ON s$s.vec_id = s0.vec_id")
      .mkString("\n")
    val cols = (0 until 8).map(s => s"s$s.cl AS c$s").mkString(", ")
    s"""WITH $chains
       |SELECT s0.vec_id, $cols
       |FROM s0_a3 s0
       |$joins
       |ORDER BY s0.vec_id""".stripMargin
  }

  /** vec_pq_search: asymmetric-distance (ADC) top-10 search over the PQ
    * codes ([[graft.operators.Pq.adcTopK]]; query = vec_id 0, the same
    * 8×4 codebooks as `vec_pq_codes`) — the query half of IVF-PQ: the
    * S×k lookup table is computed once from the unquantized query, and
    * each corpus vector costs S integer lookups. The oracle composes the
    * eight exact-Lloyd chains, builds the same LUT in SQL, and takes the
    * identical (adc ASC, vec_id ASC) top-10 — all BIGINT, no grid. */
  val vecPqSearch: Q = (s, dir) =>
    graft.operators.Pq.adcTopK(Tables.embeddings(s, dir), queryId = 0L,
      dims = 64, subspaces = 8, k = 4, rounds = 2, topK = 10)

  val vecPqSearchSql: String = {
    val chains = (0 until 8)
      .map(s => kmeansCtes(4, 2, p = s"s${s}_", dimLo = s * 8 + 1, dimHi = s * 8 + 8))
      .mkString(",\n")
    val luts = (0 until 8).map(s =>
      s"""lut$s AS (SELECT c.cl,
         |    CAST(sum((q.qx - c.c) * (q.qx - c.c)) AS BIGINT) AS pd
         |  FROM s${s}_c2 c JOIN q0 q ON q.dim = c.dim GROUP BY c.cl)""".stripMargin)
      .mkString(",\n")
    val joins = ((1 until 8)
      .map(s => s"JOIN s${s}_a3 s$s ON s$s.vec_id = s0.vec_id") ++
      (0 until 8).map(s => s"JOIN lut$s l$s ON l$s.cl = s$s.cl")).mkString("\n")
    val total = (0 until 8).map(s => s"l$s.pd").mkString(" + ")
    s"""WITH $chains,
       |q0 AS (SELECT t.i AS dim,
       |    CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qx
       |  FROM embeddings e CROSS JOIN range(1, 65) t(i) WHERE e.vec_id = 0),
       |$luts
       |SELECT s0.vec_id, CAST($total AS BIGINT) AS adc
       |FROM s0_a3 s0
       |$joins
       |ORDER BY adc, s0.vec_id LIMIT 10""".stripMargin
  }

  /** eval_pq_recall: the PQ quantization-loss audit
    * ([[graft.operators.Pq.adcRecall]]; round-10 verdict ask #7) —
    * recall@10 of `vec_pq_search`'s ADC rank against the EXACT
    * integer-grid squared-L2 top-10 for the same query (vec_id 0), the
    * number an IVF-PQ deployment watches before trusting its codes.
    * Truth and approximation share the L2 metric on the 10⁻⁶ grid, so
    * the gap measured is pure quantization loss. All machinery already
    * gated (the 8 exact-Lloyd chains; pure-BIGINT ADC and d2); hits are
    * an integer semi-join count, recall ONE r8 division. */
  val evalPqRecall: Q = (s, dir) =>
    graft.operators.Pq.adcRecall(Tables.embeddings(s, dir), queryId = 0L,
      dims = 64, subspaces = 8, k = 4, rounds = 2, topK = 10)

  val evalPqRecallSql: String = {
    val chains = (0 until 8)
      .map(s => kmeansCtes(4, 2, p = s"s${s}_", dimLo = s * 8 + 1, dimHi = s * 8 + 8))
      .mkString(",\n")
    val luts = (0 until 8).map(s =>
      s"""lut$s AS (SELECT c.cl,
         |    CAST(sum((q.qx - c.c) * (q.qx - c.c)) AS BIGINT) AS pd
         |  FROM s${s}_c2 c JOIN q0 q ON q.dim = c.dim GROUP BY c.cl)""".stripMargin)
      .mkString(",\n")
    val joins = ((1 until 8)
      .map(s => s"JOIN s${s}_a3 s$s ON s$s.vec_id = s0.vec_id") ++
      (0 until 8).map(s => s"JOIN lut$s l$s ON l$s.cl = s$s.cl")).mkString("\n")
    val total = (0 until 8).map(s => s"l$s.pd").mkString(" + ")
    s"""WITH $chains,
       |q0 AS (SELECT t.i AS dim,
       |    CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qx
       |  FROM embeddings e CROSS JOIN range(1, 65) t(i) WHERE e.vec_id = 0),
       |qall AS (SELECT e.vec_id, t.i AS dim,
       |    CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qx
       |  FROM embeddings e CROSS JOIN range(1, 65) t(i)),
       |$luts,
       |approx AS (SELECT s0.vec_id FROM s0_a3 s0
       |$joins
       |ORDER BY CAST($total AS BIGINT), s0.vec_id LIMIT 10),
       |truth AS (SELECT v.vec_id FROM qall v JOIN q0 ON q0.dim = v.dim
       |  GROUP BY v.vec_id
       |  ORDER BY sum((v.qx - q0.qx) * (v.qx - q0.qx)), v.vec_id LIMIT 10),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
       |hit AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
       |  FROM truth t JOIN approx a ON a.vec_id = t.vec_id)
       |SELECT tot.n_true, hit.n_hit,
       |  floor(CAST(hit.n_hit AS DOUBLE) / CAST(tot.n_true AS DOUBLE)
       |    * 100000000 + 0.5) / 100000000 AS recall
       |FROM tot CROSS JOIN hit""".stripMargin
  }

  /** vec_ivf_pq_search: the full IVF-PQ search path
    * ([[graft.operators.Pq.ivfAdcTopK]]): the exact-Lloyd coarse
    * quantizer (k=4 over the full vectors, the `cluster_kmeans` chain)
    * restricts the scan to the query's cell, then `vec_pq_search`'s ADC
    * ranks only cell members — candidate mass n/4 instead of n, and the
    * restriction is a NARROW broadcast-literal filter fused into the one
    * scan. All BIGINT; the oracle composes the coarse chain, the eight
    * PQ chains, the SQL LUT, and the identical cell-restricted top-10. */
  val vecIvfPqSearch: Q = (s, dir) =>
    graft.operators.Pq.ivfAdcTopK(Tables.embeddings(s, dir), queryId = 0L,
      dims = 64, subspaces = 8, k = 4, rounds = 2,
      coarseK = 4, coarseRounds = 2, topK = 10)

  val vecIvfPqSearchSql: String = {
    val chains = (0 until 8)
      .map(s => kmeansCtes(4, 2, p = s"s${s}_", dimLo = s * 8 + 1, dimHi = s * 8 + 8))
      .mkString(",\n")
    val luts = (0 until 8).map(s =>
      s"""lut$s AS (SELECT c.cl,
         |    CAST(sum((q.qx - c.c) * (q.qx - c.c)) AS BIGINT) AS pd
         |  FROM s${s}_c2 c JOIN q0 q ON q.dim = c.dim GROUP BY c.cl)""".stripMargin)
      .mkString(",\n")
    val joins = ((1 until 8)
      .map(s => s"JOIN s${s}_a3 s$s ON s$s.vec_id = s0.vec_id") ++
      (0 until 8).map(s => s"JOIN lut$s l$s ON l$s.cl = s$s.cl")).mkString("\n")
    val total = (0 until 8).map(s => s"l$s.pd").mkString(" + ")
    s"""WITH ${kmeansCtes(4, 2, p = "cv_")},
       |$chains,
       |q0 AS (SELECT t.i AS dim,
       |    CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qx
       |  FROM embeddings e CROSS JOIN range(1, 65) t(i) WHERE e.vec_id = 0),
       |$luts,
       |cell AS (SELECT cl FROM cv_a3 WHERE vec_id = 0),
       |cand AS (SELECT cv.vec_id FROM cv_a3 cv JOIN cell ON cell.cl = cv.cl)
       |SELECT s0.vec_id, CAST($total AS BIGINT) AS adc
       |FROM s0_a3 s0
       |JOIN cand ON cand.vec_id = s0.vec_id
       |$joins
       |ORDER BY adc, s0.vec_id LIMIT 10""".stripMargin
  }

  /** vec_top_pc: each vector's projection on the corpus's top principal
    * direction ([[graft.operators.Pca.topPcProjection]]; 3 power-
    * iteration rounds from the e₁ seed) — the anisotropy/drift spectral
    * summary. Every round's state is exact-integer or one correctly-
    * rounded IEEE chain (dot re-grid by double-floor, norm from an
    * EXACT Σ sq² long, sqrt correctly rounded by IEEE contract), so
    * DuckDB replays the full iteration as unrolled CTEs — the
    * `cluster_kmeans` gating recipe extended to spectral state. */
  val vecTopPc: Q = (s, dir) =>
    Pca.topPcProjection(Tables.embeddings(s, dir), dims = 64, rounds = 3)

  /** The shared power-iteration CTE chain (quantized corpus `q`, seed
    * `v0`, rounds `d_i/s_i/c_i/t_i/n_i/v_i`) — composed by both the
    * projection and the whitening oracle. */
  private def pcaCtes(rounds: Int): String = {
    def round(i: Int): String =
      s"""d$i AS (SELECT q.vec_id,
         |    CAST(floor(CAST(sum(q.qx * v.qv) AS DOUBLE) / 1000000.0) AS BIGINT) AS dq
         |  FROM q JOIN v${i - 1} v ON v.dim = q.dim GROUP BY q.vec_id),
         |s$i AS (SELECT q.dim, CAST(sum(q.qx * d.dq) AS BIGINT) AS s
         |  FROM q JOIN d$i d ON d.vec_id = q.vec_id GROUP BY q.dim),
         |c$i AS (SELECT greatest(1, CAST(floor(CAST(max(abs(s)) AS DOUBLE) / 100000000.0) AS BIGINT)) AS c
         |  FROM s$i),
         |t$i AS (SELECT s.dim, CAST(floor(CAST(s.s AS DOUBLE) / c.c) AS BIGINT) AS sq
         |  FROM s$i s CROSS JOIN c$i c),
         |n$i AS (SELECT CAST(sum(sq * sq) AS BIGINT) AS n2 FROM t$i),
         |v$i AS (SELECT t.dim,
         |    CASE WHEN n.n2 = 0 THEN p.qv
         |      ELSE CAST(floor(CAST(t.sq AS DOUBLE) / sqrt(CAST(n.n2 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |    END AS qv
         |  FROM t$i t CROSS JOIN n$i n JOIN v${i - 1} p ON p.dim = t.dim)""".stripMargin
    s"""q AS (
       |  SELECT e.vec_id, t.i AS dim,
       |    CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qx
       |  FROM embeddings e CROSS JOIN range(1, 65) t(i)),
       |v0 AS (SELECT t.i AS dim,
       |    CAST(CASE WHEN t.i = 1 THEN 1000000 ELSE 0 END AS BIGINT) AS qv
       |  FROM range(1, 65) t(i)),
       |${(1 to rounds).map(round).mkString(",\n")}""".stripMargin
  }

  val vecTopPcSql: String =
    s"""WITH ${pcaCtes(3)}
       |SELECT q.vec_id,
       |  floor((CAST(sum(q.qx * v.qv) AS DOUBLE) / 1000000000000.0) * 10000 + 0.5) / 10000 AS score
       |FROM q JOIN v3 v ON v.dim = q.dim
       |GROUP BY q.vec_id ORDER BY q.vec_id""".stripMargin

  /** vec_whiten_resid: "all-but-the-top" residual norm — each vector's
    * norm after removing its component along the 3-round top principal
    * direction ([[graft.operators.Pca.whitenResidualNorm]]); the
    * standard embedding anisotropy post-processing diagnostic. The
    * oracle composes the shared power-iteration CTE chain, then runs
    * the identical exact-BIGINT s2/d/|v|² → 3-IEEE-op residual chain. */
  val vecWhitenResid: Q = (s, dir) =>
    Pca.whitenResidualNorm(Tables.embeddings(s, dir), dims = 64, rounds = 3)

  val vecWhitenResidSql: String =
    s"""WITH ${pcaCtes(3)},
       |n2v AS (SELECT CAST(sum(qv * qv) AS BIGINT) AS n2 FROM v3),
       |rowq AS (SELECT q.vec_id,
       |    CAST(sum(q.qx * q.qx) AS BIGINT) AS s2,
       |    CAST(sum(q.qx * v.qv) AS BIGINT) AS d
       |  FROM q JOIN v3 v ON v.dim = q.dim GROUP BY q.vec_id)
       |SELECT r.vec_id,
       |  floor(sqrt(greatest(CAST(r.s2 AS DOUBLE)
       |      - CAST(r.d AS DOUBLE) * CAST(r.d AS DOUBLE) / CAST(n.n2 AS DOUBLE), 0.0))
       |    / 1000000.0 * 10000 + 0.5) / 10000 AS resid_norm
       |FROM rowq r CROSS JOIN n2v n ORDER BY r.vec_id""".stripMargin

  /** curate_cluster_balance: cluster-balanced subsampling
    * ([[graft.operators.Clustering.clusterBalancedSample]]; k=4,
    * 2 Lloyd rounds, keepRatio 0.5) — keep an equal share of every
    * k-means cluster so no dominant topic owns the kept corpus, the
    * diversity-curation counterpart of a flat hash sample. Selection is
    * the zero-shuffle md5-threshold discipline (exact integer chain, so
    * DuckDB redraws the identical sample on top of the same unrolled
    * k-means CTEs). */
  val curateClusterBalance: Q = (s, dir) =>
    Clustering.clusterBalancedSample(Tables.embeddings(s, dir),
      k = 4, rounds = 2, keepRatio = 0.5)

  val curateClusterBalanceSql: String =
    s"""WITH ${kmeansCtes(4, 2)},
       |cnt AS (SELECT cl, count(*) AS n_c FROM a3 GROUP BY cl),
       |tot AS (SELECT CAST(sum(n_c) AS BIGINT) AS n FROM cnt),
       |thr AS (SELECT c.cl,
       |    CAST(floor(281474976710656.0 *
       |      CAST(floor(1000000000.0 *
       |        least(1.0,
       |          CAST(CAST(floor(0.5 * CAST(t.n AS DOUBLE) / 4 + 0.5) AS BIGINT) AS DOUBLE)
       |            / CAST(c.n_c AS DOUBLE)) + 0.5) AS DOUBLE)
       |      / 1000000000.0) AS BIGINT) AS thr
       |  FROM cnt c CROSS JOIN tot t)
       |SELECT a.vec_id, a.cl AS cluster
       |FROM a3 a JOIN thr ON thr.cl = a.cl
       |WHERE CAST('0x' || substr(md5(a.vec_id || ':s0'), 1, 12) AS BIGINT) < thr.thr
       |ORDER BY a.vec_id""".stripMargin

  /** dedup_embedding_quant: exact dedup of vectors by their coarse
    * quantization signature — groupBy on the int8 code ARRAY, min-id
    * representative per bucket. The vector-side twin of `dedup_exact`:
    * one hash aggregation whose shuffle moves (codes, id) — 64 bytes of
    * codes instead of 256 bytes of floats — and near-identical vectors
    * (differing below half a quantization step) collapse to one row.
    * Coarse 3-level-per-dim codes (scale = absMax/3) widen the buckets;
    * the downstream semantic path for anything coarser is `pairsLsh`. */
  val dedupEmbeddingQuant: Q = (s, dir) =>
    Tables.embeddings(s, dir)
      .withColumn("scl", VectorOps.absMax(col("embedding")) / lit(3.0))
      .withColumn("qv", VectorOps.quantizeInt8(col("embedding"), col("scl")))
      .groupBy(col("qv"))
      .agg(min(col("vec_id")).as("rep_id"), count(lit(1)).as("n_vecs"))
      .select(col("rep_id"), col("n_vecs"))
      .orderBy("rep_id")

  val dedupEmbeddingQuantSql =
    """WITH a AS (
      |  SELECT vec_id, embedding,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 3.0 AS scl
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) / scl + 0.5) AS BIGINT)) AS qv
      |  FROM a)
      |SELECT min(vec_id) AS rep_id, count(*) AS n_vecs
      |FROM q GROUP BY qv ORDER BY rep_id""".stripMargin

  /** agg_regression: per-group least-squares fit + correlation — the
    * moments family closed under partial aggregation (constant-size
    * buffers, partial+final merge; the same scale shape as avg). Fits
    * price ~ quantity per return flag. */
  val aggRegression: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        r4(expr("regr_slope(l_extendedprice, l_quantity)")).as("slope"),
        r4(expr("regr_intercept(l_extendedprice, l_quantity)")).as("intercept"),
        r4(expr("regr_r2(l_extendedprice, l_quantity)")).as("r2"),
        r4(corr(col("l_extendedprice"), col("l_quantity"))).as("corr_xy"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val aggRegressionSql =
    """SELECT l_returnflag,
      |  floor((regr_slope(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS slope,
      |  floor((regr_intercept(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS intercept,
      |  floor((regr_r2(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS r2,
      |  floor((corr(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS corr_xy,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** agg_bitmap_distinct: EXACT distinct counts that re-aggregate — the
    * deterministic middle ground between countDistinct (exact, but a
    * distinct shuffle per query) and HLL sketches (mergeable, approximate).
    * Stage 1 compresses each (group, 32k-id bucket) to one bitmap —
    * partial+final, fixed ≤4 KB buffers; stage 2 ORs bitmaps and sums
    * bit counts. Persisted per-bucket bitmaps roll up to ANY coarser
    * grouping later without touching raw data (the same property
    * sketch_hll_union demonstrates, exactly). Oracle: plain
    * COUNT(DISTINCT). */
  val aggBitmapDistinct: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"), expr("bitmap_bucket_number(user_id)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
      .groupBy("event_type")
      .agg(sum(expr("bitmap_count(bm)")).as("ndv"))
      .orderBy("event_type")

  val aggBitmapDistinctSql =
    """SELECT event_type, count(DISTINCT user_id) AS ndv
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** graph_bfs: min hop distances from one part across the bipartite
    * part↔supplier co-occurrence graph (nodes encoded part→2k,
    * supplier→2k+1) — the iterative-frontier answer to SQL's
    * `WITH RECURSIVE`, which Spark lacks. Depth-capped identically on
    * both engines so cyclic reachability is well-defined. */
  val graphBfs: Q = (s, dir) => {
    val ed = Tables.lineitem(s, dir)
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val sym = ed.unionAll(ed.select(col("dst").as("src"), col("src").as("dst")))
    graft.operators.Graph.bfs(sym, seed = 2L, maxDepth = 6).orderBy("node")
  }

  val graphBfsSql =
    """WITH RECURSIVE sym AS (
      |  SELECT src, dst FROM (
      |    SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |    FROM lineitem) e
      |  UNION ALL
      |  SELECT dst, src FROM (
      |    SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |    FROM lineitem) e2),
      |walk(node, dist) AS (
      |  SELECT CAST(2 AS BIGINT) AS node, 0 AS dist
      |  UNION
      |  SELECT s.dst AS node, w.dist + 1 AS dist
      |  FROM walk w JOIN sym s ON s.src = w.node
      |  WHERE w.dist < 6)
      |SELECT node, MIN(dist) AS dist FROM walk
      |GROUP BY node ORDER BY node""".stripMargin

  /** dq_audit: relational data-quality audit — the validation-rules half
    * of the reference's data-hygiene concern (schema-level checks live in
    * `FileView.retype`'s violations array; THESE are the cross-row /
    * cross-table rules a schema can't express): primary-key uniqueness,
    * referential integrity, domain ranges, null contracts. One long-form
    * report row per check, (violations, checked) — the shape a data
    * platform alerts on.
    *
    * Scale shape: each check is a single exact aggregate over its table
    * (constant-size buffers, map-side combined); the FK check rides ONE
    * left join co-keyed on the fact's join column, counting misses and
    * rows in the same pass. No check collects rows — violations are
    * COUNTED here; the drill-down query that lists offenders is a
    * pushed-filter scan a user writes next. */
  val dqAudit: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val e = Tables.events(s, dir)
    val c = Tables.customer(s, dir)
    import graft.operators.Relational.{dqCheck, dqCheckFk}
    val pkUnique = o.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_violations"),
      count(lit(1)).as("n_checked"))
      .select(lit("orders_pk_unique").as("check_name"), col("n_violations"), col("n_checked"))
    pkUnique
      .unionAll(dqCheckFk(li, col("l_orderkey"), o, col("o_orderkey"), "lineitem_fk_orders"))
      .unionAll(dqCheck(li, "lineitem_qty_1_50",
        col("l_quantity") < 1 || col("l_quantity") > 50))
      .unionAll(dqCheck(li, "lineitem_price_positive", col("l_extendedprice") <= 0))
      .unionAll(dqCheck(e, "events_ts_nonnull", col("ts").isNull))
      .unionAll(dqCheck(c, "customer_name_nonempty",
        col("c_name").isNull || length(col("c_name")) === 0))
      .orderBy("check_name")
  }

  val dqAuditSql =
    """SELECT * FROM (
      |  SELECT 'orders_pk_unique' AS check_name,
      |    count(*) - count(DISTINCT o_orderkey) AS n_violations, count(*) AS n_checked
      |  FROM orders
      |  UNION ALL
      |  SELECT 'lineitem_fk_orders',
      |    count(CASE WHEN l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL
      |               THEN 1 END), count(*)
      |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      |    ON l.l_orderkey = o.o_orderkey
      |  UNION ALL
      |  SELECT 'lineitem_qty_1_50',
      |    count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END), count(*)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_price_positive',
      |    count(CASE WHEN l_extendedprice <= 0 THEN 1 END), count(*)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'events_ts_nonnull',
      |    count(CASE WHEN ts IS NULL THEN 1 END), count(*)
      |  FROM events
      |  UNION ALL
      |  SELECT 'customer_name_nonempty',
      |    count(CASE WHEN c_name IS NULL OR length(c_name) = 0 THEN 1 END), count(*)
      |  FROM customer)
      |ORDER BY check_name""".stripMargin

  /** graph_kcore: fixed-round k-core peeling (k=3, 5 rounds) over the
    * symmetrized part↔supplier graph
    * ([[graft.operators.Graph.kcore]]) — surviving (node, degree) after
    * the cohesion filter. Pure integer cascade; the oracle unrolls the
    * identical peel rounds as CTEs. */
  /** graph_cc_incremental: INCREMENTAL connected components
    * ([[graft.operators.Components.ccApplyDelta]], round 10) — apply a
    * delta edge batch to a stored min-id component assignment without
    * re-reading base edges, the graph-side member of the IVM family
    * (`rollup_incremental`, `scd2_incremental`). The planted graph is
    * customer→order stars plus sparse order-chain bridges (2% of
    * orders), so components stay small while the delta exercises all
    * three refresh cases: new members joining existing components,
    * brand-new components, and BRIDGE edges merging two stored
    * components. The delta split (xxhash64 of the edge) is Spark-side
    * bookkeeping only — the oracle IS the full recompute over
    * base ∪ delta (a WITH RECURSIVE min-label closure), which is the
    * IVM identity this query gates. */
  val graphCcIncremental: Q = (s, dir) => {
    import graft.operators.Components
    val o = Tables.orders(s, dir)
      .select(col("o_custkey").cast("long").as("c"),
        col("o_orderkey").cast("long").as("o"))
    val star = o.select((col("c") * 2).as("a_id"), (col("o") * 2 + 1).as("b_id"))
    val chain = o.as("a").join(o.as("b"),
        col("a.o") + 1 === col("b.o") && col("a.o") % 50 === 0)
      .select((col("a.o") * 2 + 1).as("a_id"), (col("b.o") * 2 + 1).as("b_id"))
    // one materialization of the star∪chain build (round 15): the base
    // filter, the delta filter, AND ccApplyDelta's allNodes union each
    // re-ran the orders self-join otherwise — three evaluations
    val edges = graft.operators.Checkpointing.cut(star.unionAll(chain))
    val isDelta = pmod(xxhash64(col("a_id"), col("b_id")), lit(4)) === 0
    val state = Components.connectedComponents(edges.filter(!isDelta))
    Components.ccApplyDelta(state, edges.filter(isDelta)).orderBy("node")
  }

  val graphCcIncrementalSql: String =
    """WITH RECURSIVE o2 AS (
      |  SELECT CAST(o_custkey AS BIGINT) AS c, CAST(o_orderkey AS BIGINT) AS o
      |  FROM orders),
      |star AS (SELECT c*2 AS s, o*2+1 AS d FROM o2),
      |chain AS (SELECT a.o*2+1 AS s, b.o*2+1 AS d
      |  FROM o2 a JOIN o2 b ON b.o = a.o + 1 WHERE a.o % 50 = 0),
      |p AS (SELECT s, d FROM star UNION ALL SELECT s, d FROM chain),
      |e AS (SELECT s, d FROM p UNION ALL SELECT d, s FROM p),
      |r(n, m) AS (
      |  SELECT s, s FROM e
      |  UNION
      |  SELECT r.n, e.d FROM r JOIN e ON r.m = e.s)
      |SELECT n AS node, CAST(min(m) AS BIGINT) AS cluster_id
      |FROM r GROUP BY n ORDER BY node""".stripMargin

  val graphKcore: Q = (s, dir) => {
    val ed = Tables.lineitem(s, dir)
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val sym = ed.unionAll(ed.select(col("dst").as("src"), col("src").as("dst")))
    graft.operators.Graph.kcore(sym, k = 3, rounds = 5).orderBy("node")
  }

  val graphKcoreSql: String = {
    val rounds = (1 to 5).map { i =>
      s"""k$i AS (SELECT src AS node FROM e${i - 1} GROUP BY src HAVING count(*) >= 3),
         |e$i AS (SELECT e.src, e.dst FROM e${i - 1} e
         |  JOIN k$i a ON a.node = e.src JOIN k$i b ON b.node = e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem),
       |e0 AS (SELECT src, dst FROM base UNION ALL SELECT dst, src FROM base),
       |$rounds
       |SELECT src AS node, count(*) AS deg FROM e5 GROUP BY src ORDER BY node""".stripMargin
  }

  /** dq_drift_psi: Population Stability Index drift between two
    * snapshots of a column ([[graft.operators.Drift.psi]]; 10 reference-
    * anchored fixed-width bins, Laplace smoothing) — the per-column
    * drift alarm beside `dq_audit`'s rule checks. Two comparisons: an
    * even/odd orderkey split (a true null — PSI ≈ 0 certifies the
    * metric's floor) and all-vs-high-quantity (a real induced shift in
    * the price distribution). Per-bin terms quantize to the 1e-8 grid
    * before the cross-bin LONG sum (pagerank recipe); r4 absorbs libm
    * ln ulp drift (ngram-lm contract). */
  val dqDriftPsi: Q = (s, dir) => {
    import graft.operators.Drift
    val li = Tables.lineitem(s, dir)
    Drift.psi(li.filter(col("l_orderkey") % 2 === 0),
        li.filter(col("l_orderkey") % 2 === 1), col("l_extendedprice"), 10)
      .select(lit("price_even_vs_odd").as("comparison"), col("psi"),
        col("n_ref"), col("n_cur"))
      .unionAll(
        Drift.psi(li, li.filter(col("l_quantity") > 25), col("l_extendedprice"), 10)
          .select(lit("price_all_vs_highqty").as("comparison"), col("psi"),
            col("n_ref"), col("n_cur")))
      .orderBy("comparison")
  }

  val dqDriftPsiSql: String = {
    def chain(p: String, refW: String, curW: String, label: String): String = {
      def binCte(name: String, w: String): String =
        s"""${p}$name AS (SELECT bin, count(*) AS c FROM (
           |    SELECT CASE WHEN b.hi = b.lo THEN 0 ELSE
           |        least(9, greatest(0, CAST(floor((CAST(l_extendedprice AS DOUBLE) - b.lo)
           |          / ((b.hi - b.lo) / 10)) AS INT))) END AS bin
           |    FROM lineitem CROSS JOIN ${p}b b
           |    WHERE ($w) AND l_extendedprice IS NOT NULL) GROUP BY bin)""".stripMargin
      val pS = "(c_cur + 1.0) / (t.n_cur + 10.0)"
      val qS = "(c_ref + 1.0) / (t.n_ref + 10.0)"
      s"""${p}b AS (SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
         |    CAST(max(l_extendedprice) AS DOUBLE) AS hi
         |  FROM lineitem WHERE ($refW) AND l_extendedprice IS NOT NULL),
         |${binCte("r", refW)},
         |${binCte("c", curW)},
         |${p}f AS (SELECT s.bin, coalesce(r.c, 0) AS c_ref, coalesce(cu.c, 0) AS c_cur
         |  FROM (SELECT unnest(range(0, 10)) AS bin) s
         |  LEFT JOIN ${p}r r ON r.bin = s.bin
         |  LEFT JOIN ${p}c cu ON cu.bin = s.bin),
         |${p}t AS (SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
         |    CAST(sum(c_cur) AS BIGINT) AS n_cur FROM ${p}f),
         |${p}o AS (SELECT '$label' AS comparison,
         |    floor((CAST(sum(CAST(floor(($pS - $qS) * ln(($pS) / ($qS))
         |      * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0)
         |      * 10000 + 0.5) / 10000 AS psi,
         |    t.n_ref, t.n_cur
         |  FROM ${p}f CROSS JOIN ${p}t t GROUP BY t.n_ref, t.n_cur)""".stripMargin
    }
    s"""WITH ${chain("x_", "l_orderkey % 2 = 0", "l_orderkey % 2 = 1", "price_even_vs_odd")},
       |${chain("y_", "TRUE", "l_quantity > 25", "price_all_vs_highqty")}
       |SELECT * FROM x_o UNION ALL SELECT * FROM y_o ORDER BY comparison""".stripMargin
  }

  /** dq_drift_ks: two-sample Kolmogorov–Smirnov drift between the
    * even- and odd-orderkey snapshots of `l_extendedprice` — the
    * NONPARAMETRIC drift alarm beside `dq_drift_psi`'s binned PSI:
    * D = max_v |F̂₁(v) − F̂₂(v)|, reported as the exact integer
    * D_scaled = max |n₂·F₁(v) − n₁·F₂(v)| (both ECDFs cross-multiplied
    * to clear the denominators — pure BIGINT, no float until the final
    * single division; regime n₁·n₂ < 2⁶³, i.e. ≲3·10⁹ rows per side,
    * beyond which pre-aggregate). Ties at equal D break to the
    * SMALLEST value.
    *
    * Scale shape: per-value counts are ONE map-side-combined exchange;
    * the global ECDF is the `pack_chunks` two-phase prefix sum (range-
    * bucketed parallel cumsums + a bounded per-bucket base frame —
    * never the single-task global window); totals ride a 1-row
    * broadcast; the argmax is one struct-max aggregate. */
  val dqDriftKs: Q = (s, dir) =>
    graft.operators.Drift.ksScaled(
      Tables.lineitem(s, dir).filter(col("l_extendedprice").isNotNull),
      col("l_extendedprice"), pmod(col("l_orderkey"), lit(2)) === 0)

  val dqDriftKsSql: String =
    """WITH t AS (SELECT l_extendedprice AS v, l_orderkey % 2 = 0 AS ref
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
      |c AS (SELECT v,
      |    CAST(sum(CASE WHEN ref THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN NOT ref THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM t GROUP BY v),
      |f AS (SELECT v, CAST(sum(c1) OVER w AS BIGINT) AS f1,
      |    CAST(sum(c2) OVER w AS BIGINT) AS f2
      |  FROM c WINDOW w AS (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
      |    CAST(sum(c2) AS BIGINT) AS n2 FROM c),
      |d AS (SELECT f.v, abs(n.n2 * f.f1 - n.n1 * f.f2) AS d, n.n1, n.n2
      |  FROM f CROSS JOIN n),
      |m AS (SELECT v, d, n1, n2,
      |    row_number() OVER (ORDER BY d DESC, v ASC) AS rn FROM d)
      |SELECT n1, n2, d AS d_scaled, v AS at_value,
      |  floor(CAST(d AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) * 100000000 + 0.5)
      |    / 100000000 AS ks
      |FROM m WHERE rn = 1""".stripMargin

  /** graph_pagerank: power-iteration PageRank over the same symmetrized
    * part↔supplier graph as [[graphBfs]] ([[graft.operators.Graph.pagerank]]
    * — the web-graph source-quality signal). A FIXED 6 rounds with
    * per-round rounding makes the result a deterministic function of the
    * input, so the oracle can recompute it by unrolling the identical six
    * rounds as plain CTEs (aggregation is illegal inside `WITH RECURSIVE`,
    * so unrolling — not recursion — is the SQL-expressible form). */
  val graphPagerankIters = 6

  val graphPagerank: Q = (s, dir) => {
    val ed = Tables.lineitem(s, dir)
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val sym = ed.unionAll(ed.select(col("dst").as("src"), col("src").as("dst")))
    graft.operators.Graph.pagerank(sym, iters = graphPagerankIters).orderBy("node")
  }

  val graphPagerankSql: String = {
    val rounds = (1 to graphPagerankIters).map { i =>
      s"""c$i AS (SELECT e.dst AS node,
         |    sum(CAST(floor(r${i - 1}.rank * 100000000 / deg.outdeg + 0.5) AS BIGINT)) AS wq
         |  FROM r${i - 1} JOIN e ON e.src = r${i - 1}.node JOIN deg ON deg.src = e.src
         |  GROUP BY e.dst),
         |r$i AS (SELECT no.node,
         |    floor(((1.0 - 0.85) / nn.n + 0.85 * (coalesce(c$i.wq, 0) / 100000000.0)) * 100000000 + 0.5) / 100000000 AS rank
         |  FROM nodes no CROSS JOIN nn LEFT JOIN c$i ON c$i.node = no.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem),
       |e AS (SELECT src, dst FROM base UNION ALL SELECT dst, src FROM base),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, floor((1.0 / nn.n) * 100000000 + 0.5) / 100000000 AS rank
       |  FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT node, rank FROM r$graphPagerankIters ORDER BY node""".stripMargin
  }

  /** graph_ppr: personalized PageRank from seed parts {2,4,6} (part
    * keys 1..3 doubled — present at every SF) over the same symmetrized
    * part↔supplier graph ([[graft.operators.Graph.personalizedPagerank]]).
    * Proximity-to-seeds ranking — the "more like these" graph signal
    * beside `graph_pagerank`'s global centrality. Same fixed-6-round
    * unrolled-CTE oracle; the only chain difference is the CASE-gated
    * teleport term, token-mirrored in both engines. */
  val graphPprIters = 6
  val graphPprSeeds: Seq[Long] = Seq(2L, 4L, 6L)

  val graphPpr: Q = (s, dir) => {
    val ed = Tables.lineitem(s, dir)
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val sym = ed.unionAll(ed.select(col("dst").as("src"), col("src").as("dst")))
    graft.operators.Graph.personalizedPagerank(sym, graphPprSeeds,
      iters = graphPprIters).orderBy("node")
  }

  val graphPprSql: String = {
    val seedList = graphPprSeeds.mkString("(", ", ", ")")
    val k = graphPprSeeds.size
    val rounds = (1 to graphPprIters).map { i =>
      s"""c$i AS (SELECT e.dst AS node,
         |    sum(CAST(floor(r${i - 1}.rank * 100000000 / deg.outdeg + 0.5) AS BIGINT)) AS wq
         |  FROM r${i - 1} JOIN e ON e.src = r${i - 1}.node JOIN deg ON deg.src = e.src
         |  GROUP BY e.dst),
         |r$i AS (SELECT no.node,
         |    floor(((CASE WHEN no.node IN $seedList THEN (1.0 - 0.85) / $k ELSE 0.0 END)
         |      + 0.85 * (coalesce(c$i.wq, 0) / 100000000.0)) * 100000000 + 0.5) / 100000000 AS rank
         |  FROM nodes no LEFT JOIN c$i ON c$i.node = no.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem),
       |e AS (SELECT src, dst FROM base UNION ALL SELECT dst, src FROM base),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |r0 AS (SELECT node,
       |    CASE WHEN node IN $seedList THEN floor((1.0 / $k) * 100000000 + 0.5) / 100000000
       |      ELSE 0.0 END AS rank
       |  FROM nodes),
       |$rounds
       |SELECT node, rank FROM r$graphPprIters ORDER BY node""".stripMargin
  }

  /** graph_katz: Katz centrality over the same symmetrized
    * part↔supplier graph ([[graft.operators.Graph.katzCentrality]],
    * 4 rounds, dyadic α = 1/64): the walk-counting centrality beside
    * `graph_pagerank` (stochastic) and `graph_hits` (mutual
    * reinforcement). The whole chain is BIGINT floor division — the
    * only double is the final display ratio, r8-gridded. */
  val graphKatzIters = 4

  val graphKatz: Q = (s, dir) => {
    val ed = Tables.lineitem(s, dir)
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val sym = ed.unionAll(ed.select(col("dst").as("src"), col("src").as("dst")))
    graft.operators.Graph.katzCentrality(sym, iters = graphKatzIters)
      .orderBy("node")
  }

  val graphKatzSql: String = {
    val rounds = (1 to graphKatzIters).map { i =>
      s"""c$i AS (SELECT e.dst AS node, sum(x${i - 1}.katz_u) AS s
         |  FROM x${i - 1} JOIN e ON e.src = x${i - 1}.node GROUP BY 1),
         |x$i AS (SELECT n.node,
         |    CAST(100000000 + coalesce(c$i.s, 0) // 64 AS BIGINT) AS katz_u
         |  FROM nodes n LEFT JOIN c$i ON c$i.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem),
       |e AS (SELECT src, dst FROM base UNION ALL SELECT dst, src FROM base),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |x0 AS (SELECT node, CAST(100000000 AS BIGINT) AS katz_u FROM nodes),
       |$rounds
       |SELECT node, katz_u,
       |  floor((CAST(katz_u AS DOUBLE) / 100000000.0) * 100000000 + 0.5) / 100000000 AS katz
       |FROM x$graphKatzIters ORDER BY node""".stripMargin
  }

  /** graph_label_prop: synchronous label-propagation communities over
    * the same symmetrized part↔supplier graph as [[graphPagerank]]
    * ([[graft.operators.Graph.labelPropagation]]; 4 fixed rounds,
    * min-label tie-break). Pure integer state — the oracle unrolls the
    * identical rounds, argmax via a ROW_NUMBER window where the engine
    * uses a struct-max aggregate (same (cnt DESC, label ASC) order). */
  val graphLabelPropIters = 4

  val graphLabelProp: Q = (s, dir) => {
    val ed = Tables.lineitem(s, dir)
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val sym = ed.unionAll(ed.select(col("dst").as("src"), col("src").as("dst")))
    graft.operators.Graph.labelPropagation(sym, iters = graphLabelPropIters)
      .orderBy("node")
  }

  /** The label-propagation unroll as a WITH-prefix (shared by
    * `graph_label_prop` and `graph_modularity`'s oracles): defines
    * `e` (symmetrized edges) and `l$iters` (final labels). */
  private def labelPropCtePrefix: String = {
    val rounds = (1 to graphLabelPropIters).map { i =>
      s"""v$i AS (SELECT e.dst AS node, l.label, count(*) AS cnt
         |  FROM l${i - 1} l JOIN e ON e.src = l.node GROUP BY e.dst, l.label),
         |l$i AS (SELECT node, label FROM (
         |    SELECT node, label,
         |      row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn
         |    FROM v$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem),
       |e AS (SELECT src, dst FROM base UNION ALL SELECT dst, src FROM base),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
       |$rounds""".stripMargin
  }

  val graphLabelPropSql: String =
    s"""$labelPropCtePrefix
       |SELECT node, label FROM l$graphLabelPropIters ORDER BY node""".stripMargin

  /** graph_adamic_adar: Adamic–Adar link prediction
    * ([[graft.operators.Graph.adamicAdar]]) over the low-quantity
    * part↔supplier co-supply graph — part pairs sharing ≥2 suppliers,
    * scored Σ 1/ln(deg). The `l_quantity ≤ 2` restriction is the
    * declared subgraph: supplier degree stays ~24 flat across SFs
    * (suppliers scale with the data), so wedge mass is measured linear
    * — the full graph saturates toward complete (avg deg 591 at sf0.1,
    * 175M wedges) and is exactly the regime the maxDeg hub guard
    * exists for. */
  val graphAdamicAdar: Q = (s, dir) =>
    graft.operators.Graph.adamicAdar(
      Tables.lineitem(s, dir).filter(col("l_quantity") <= 2)
        .select(col("l_partkey").as("left"), col("l_suppkey").as("right")),
      maxDeg = 1000L, minCn = 2L)
      .orderBy("u", "v")

  val graphAdamicAdarSql: String =
    """WITH e AS (
      |  SELECT DISTINCT l_partkey AS lft, l_suppkey AS rgt
      |  FROM lineitem WHERE l_quantity <= 2),
      |ctr AS (
      |  SELECT rgt,
      |    CAST(floor(100000000.0 / ln(CAST(count(*) AS DOUBLE)) + 0.5) AS BIGINT)
      |      AS aa_unit
      |  FROM e GROUP BY rgt HAVING count(*) >= 2 AND count(*) <= 1000),
      |t AS (SELECT e.lft, e.rgt, ctr.aa_unit FROM e JOIN ctr USING (rgt))
      |SELECT a.lft AS u, b.lft AS v, count(*) AS cn,
      |  CAST(sum(a.aa_unit) AS BIGINT) AS aa_micro,
      |  CAST(sum(a.aa_unit) AS DOUBLE) / 100000000.0 AS aa
      |FROM t a JOIN t b ON a.rgt = b.rgt AND a.lft < b.lft
      |GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY u, v""".stripMargin

  /** graph_jaccard: neighbor-set Jaccard link prediction
    * ([[graft.operators.Graph.jaccardPairs]]) over the same low-quantity
    * part↔supplier co-supply subgraph as [[graphAdamicAdar]] — part
    * pairs sharing ≥2 guarded suppliers, scored cn/(du+dv−cn). All
    * counts integer over the guarded center set; jac is one IEEE
    * division on the 1e-8 grid. */
  val graphJaccard: Q = (s, dir) =>
    graft.operators.Graph.jaccardPairs(
      Tables.lineitem(s, dir).filter(col("l_quantity") <= 2)
        .select(col("l_partkey").as("left"), col("l_suppkey").as("right")),
      maxDeg = 1000L, minCn = 2L)
      .orderBy("u", "v")

  val graphJaccardSql: String =
    """WITH e AS (
      |  SELECT DISTINCT l_partkey AS lft, l_suppkey AS rgt
      |  FROM lineitem WHERE l_quantity <= 2),
      |ctr AS (
      |  SELECT rgt FROM e GROUP BY rgt
      |  HAVING count(*) >= 2 AND count(*) <= 1000),
      |t AS (SELECT e.lft, e.rgt FROM e JOIN ctr USING (rgt)),
      |deg AS (SELECT lft, count(*) AS deg FROM t GROUP BY lft),
      |p AS (SELECT a.lft AS u, b.lft AS v, count(*) AS cn
      |  FROM t a JOIN t b ON a.rgt = b.rgt AND a.lft < b.lft
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT p.u, p.v, p.cn, du.deg AS du, dv.deg AS dv,
      |  floor(CAST(p.cn AS DOUBLE) / CAST(du.deg + dv.deg - p.cn AS DOUBLE)
      |    * 100000000 + 0.5) / 100000000 AS jac
      |FROM p JOIN deg du ON du.lft = p.u JOIN deg dv ON dv.lft = p.v
      |ORDER BY u, v""".stripMargin

  /** graph_modularity: Newman modularity of the [[graphLabelProp]]
    * communities on the same symmetrized part↔supplier graph
    * ([[graft.operators.Graph.modularity]]) — the "are these
    * communities real" score beside the assignment itself. Per
    * community: node count, intra-edge mass, degree mass, and the
    * BIGINT-exact numerator q_num = m2·intra2 − d_tot² (Q_c scaled by
    * m2²); the only float is q_contrib = q_num/m2², one IEEE division
    * on the 1e-8 grid. */
  val graphModularity: Q = (s, dir) => {
    val ed = Tables.lineitem(s, dir)
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    // One materialization of the symmetrized frame feeds BOTH the
    // label-propagation rounds and the modularity scorer (round 15):
    // unshared, each consumer re-derived scan+distinct+union — with
    // modularity referencing its edge input three times (deg/intra/m2),
    // that was four extra evaluations of the distinct.
    val sym = graft.operators.Checkpointing.cut(
      ed.unionAll(ed.select(col("dst").as("src"), col("src").as("dst"))))
    val labels = graft.operators.Graph.labelPropagation(sym, iters = graphLabelPropIters)
    graft.operators.Graph.modularity(sym, labels).orderBy("label")
  }

  val graphModularitySql: String =
    s"""$labelPropCtePrefix,
       |lab AS (SELECT node, label FROM l$graphLabelPropIters),
       |deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src),
       |dt AS (SELECT lab.label, count(*) AS n_nodes,
       |    CAST(sum(deg.deg) AS BIGINT) AS d_tot
       |  FROM deg JOIN lab ON lab.node = deg.node GROUP BY lab.label),
       |intra AS (SELECT ls.label, count(*) AS intra2
       |  FROM e JOIN lab ls ON ls.node = e.src JOIN lab ld ON ld.node = e.dst
       |  WHERE ls.label = ld.label GROUP BY ls.label),
       |m AS (SELECT count(*) AS m2 FROM e)
       |SELECT dt.label, dt.n_nodes,
       |  CAST(coalesce(intra.intra2, 0) AS BIGINT) AS intra2, dt.d_tot,
       |  CAST(m.m2 * coalesce(intra.intra2, 0) - dt.d_tot * dt.d_tot AS BIGINT)
       |    AS q_num,
       |  ${graft.functions.Num.r8Sql(
      "CAST(m.m2 * coalesce(intra.intra2, 0) - dt.d_tot * dt.d_tot AS DOUBLE)" +
        " / CAST(m.m2 * m.m2 AS DOUBLE)")} AS q_contrib
       |FROM dt LEFT JOIN intra ON intra.label = dt.label CROSS JOIN m
       |ORDER BY dt.label""".stripMargin

  /** graph_triangle_count: exact per-node triangle counts
    * ([[graft.operators.Graph.triangleCounts]], degree-oriented wedge
    * closure) over a unipartite folding of orders (custkey and orderkey
    * mod m share one id space — the part↔supplier graph is bipartite,
    * hence triangle-free). The modulus SCALES WITH THE INPUT
    * (m = max(2003, n/37), one scalar count, mirrored as a scalar
    * subquery in the oracle): a FIXED node space saturates toward the
    * complete graph as input grows — the ×10 probe read 126 s (72× per
    * 10×) at mod 2003 because wedge mass is Σ C(outdeg⁺,2) and degree
    * rose with SF; pegging expected degree (~74) keeps the curve linear,
    * the size-your-key-space-to-your-data design rule made executable.
    * Pure integer pipeline, so the oracle replays the identical
    * canonicalize→orient→wedge→close→attribute steps. */
  val graphTriangleCount: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val m = math.max(2003L, orders.count() / 37L) // scalar aggregate, never rows
    graft.operators.Graph.triangleCounts(
        orders.select(
          (col("o_custkey") % m).as("src"), (col("o_orderkey") % m).as("dst")),
        nodeIdBound = m)
      .orderBy("node")
  }

  val graphTriangleCountSql =
    """WITH mm AS (SELECT greatest(2003, count(*) // 37) AS m FROM orders),
      |raw AS (SELECT o_custkey % mm.m AS src, o_orderkey % mm.m AS dst
      |  FROM orders CROSS JOIN mm),
      |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      |  FROM raw WHERE src <> dst),
      |deg AS (SELECT node, count(*) * mm.m + node AS ok FROM (
      |    SELECT u AS node FROM und UNION ALL SELECT v FROM und) CROSS JOIN mm
      |  GROUP BY node, mm.m),
      |o AS (SELECT CASE WHEN du.ok < dv.ok THEN e.u ELSE e.v END AS src,
      |    CASE WHEN du.ok < dv.ok THEN e.v ELSE e.u END AS dst,
      |    greatest(du.ok, dv.ok) AS dst_ok
      |  FROM und e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
      |w AS (SELECT e1.src AS apex, e1.dst AS a, e2.dst AS b
      |  FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst_ok < e2.dst_ok),
      |t AS (SELECT apex, a, b FROM w JOIN o e3 ON w.a = e3.src AND w.b = e3.dst),
      |pn AS (SELECT node, count(*) AS n_tri FROM (
      |    SELECT apex AS node FROM t
      |    UNION ALL SELECT a FROM t
      |    UNION ALL SELECT b FROM t) GROUP BY node)
      |SELECT d.node, coalesce(pn.n_tri, 0) AS n_tri
      |FROM deg d LEFT JOIN pn ON pn.node = d.node
      |ORDER BY d.node""".stripMargin

  /** dq_benford: Benford's-law first-digit audit of o_totalprice
    * ([[graft.operators.Drift.benfordScaled]]) — the forensic
    * synthetic-data detector beside `dq_drift_psi`/`dq_drift_ks`'s
    * two-snapshot drift: per leading digit, the observed count, the
    * micro-unit Benford expectation, the BIGINT deviation, and an
    * r8-gridded χ² contribution. The digit comes from integer cents
    * rendering (never libm log10); the probability constants are pasted
    * into BOTH engines from one driver-side computation. The fixture's
    * uniform price generator fails Benford loudly — which is exactly
    * the audit's point. */
  val dqBenford: Q = (s, dir) =>
    graft.operators.Drift.benfordScaled(
        Tables.orders(s, dir), col("o_totalprice"))
      .orderBy("digit")

  val dqBenfordSql: String = {
    val rows = graft.operators.Drift.benfordMicro.toSeq.sorted
      .map { case (d, m) => s"($d, ${m}::BIGINT)" }.mkString(", ")
    s"""WITH cents AS (
       |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND floor(o_totalprice * 100 + 0.5) > 0),
       |cnt AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit,
       |    count(*) AS n_obs FROM cents GROUP BY digit),
       |n AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM cnt),
       |p AS (SELECT * FROM (VALUES $rows) AS t(digit, p_micro))
       |SELECT p.digit, CAST(coalesce(cnt.n_obs, 0) AS BIGINT) AS n_obs,
       |  p.p_micro,
       |  CAST(n.n_total * p.p_micro AS BIGINT) AS e_scaled,
       |  CAST(coalesce(cnt.n_obs, 0) * 100000000 - n.n_total * p.p_micro
       |    AS BIGINT) AS dev,
       |  ${graft.functions.Num.r8Sql(
      "CAST(coalesce(cnt.n_obs, 0) * 100000000 - n.n_total * p.p_micro AS DOUBLE)" +
        " * CAST(coalesce(cnt.n_obs, 0) * 100000000 - n.n_total * p.p_micro AS DOUBLE)" +
        " / (CAST(n.n_total * p.p_micro AS DOUBLE) * 100000000)")} AS chi_term
       |FROM p LEFT JOIN cnt ON cnt.digit = p.digit CROSS JOIN n
       |ORDER BY p.digit""".stripMargin
  }

  /** graph_clustering_coeff: local clustering coefficient per node
    * ([[graft.operators.Graph.clusteringCoeff]]) over the SAME folded
    * orders graph as `graph_triangle_count` (scaling modulus — see that
    * query's note): c_v = 2·T_v/(deg·(deg−1)), the per-node cohesion
    * signal the raw triangle count feeds. Integer numerator and
    * denominator; ONE r8-gridded IEEE division — the oracle replays the
    * identical pipeline plus the same division. */
  val graphClusteringCoeff: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val m = math.max(2003L, orders.count() / 37L) // scalar aggregate, never rows
    graft.operators.Graph.clusteringCoeff(
        orders.select(
          (col("o_custkey") % m).as("src"), (col("o_orderkey") % m).as("dst")),
        nodeIdBound = m)
      .orderBy("node")
  }

  val graphClusteringCoeffSql =
    """WITH mm AS (SELECT greatest(2003, count(*) // 37) AS m FROM orders),
      |raw AS (SELECT o_custkey % mm.m AS src, o_orderkey % mm.m AS dst
      |  FROM orders CROSS JOIN mm),
      |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      |  FROM raw WHERE src <> dst),
      |deg AS (SELECT node, count(*) AS deg, count(*) * mm.m + node AS ok FROM (
      |    SELECT u AS node FROM und UNION ALL SELECT v FROM und) CROSS JOIN mm
      |  GROUP BY node, mm.m),
      |o AS (SELECT CASE WHEN du.ok < dv.ok THEN e.u ELSE e.v END AS src,
      |    CASE WHEN du.ok < dv.ok THEN e.v ELSE e.u END AS dst,
      |    greatest(du.ok, dv.ok) AS dst_ok
      |  FROM und e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
      |w AS (SELECT e1.src AS apex, e1.dst AS a, e2.dst AS b
      |  FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst_ok < e2.dst_ok),
      |t AS (SELECT apex, a, b FROM w JOIN o e3 ON w.a = e3.src AND w.b = e3.dst),
      |pn AS (SELECT node, count(*) AS n_tri FROM (
      |    SELECT apex AS node FROM t
      |    UNION ALL SELECT a FROM t
      |    UNION ALL SELECT b FROM t) GROUP BY node)
      |SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
      |  CAST(coalesce(pn.n_tri, 0) AS BIGINT) AS n_tri,
      |  CASE WHEN d.deg >= 2 THEN
      |    floor(CAST(coalesce(pn.n_tri, 0) * 2 AS DOUBLE)
      |      / CAST(d.deg * (d.deg - 1) AS DOUBLE) * 100000000 + 0.5) / 100000000
      |  ELSE 0.0 END AS coeff
      |FROM deg d LEFT JOIN pn ON pn.node = d.node
      |ORDER BY d.node""".stripMargin

  /** graph_assortativity: Newman degree-mixing coefficient
    * ([[graft.operators.Graph.degreeAssortativity]]) of the folded
    * orders graph — one scalar row answering "do hubs attach to hubs".
    * Every sum is BIGINT over the both-directions edge set (Σj = Σk by
    * symmetry, so the Pearson r collapses to three sums); the only
    * float is one r8-gridded IEEE division of exact-in-double longs. */
  val graphAssortativity: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val m = math.max(2003L, orders.count() / 37L)
    graft.operators.Graph.degreeAssortativity(
      orders.select(
        (col("o_custkey") % m).as("src"), (col("o_orderkey") % m).as("dst")))
  }

  val graphAssortativitySql =
    """WITH mm AS (SELECT greatest(2003, count(*) // 37) AS m FROM orders),
      |raw AS (SELECT o_custkey % mm.m AS src, o_orderkey % mm.m AS dst
      |  FROM orders CROSS JOIN mm),
      |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      |  FROM raw WHERE src <> dst),
      |bo AS (SELECT u AS s, v AS d FROM und
      |  UNION ALL SELECT v AS s, u AS d FROM und),
      |deg AS (SELECT s AS node, count(*) AS deg FROM bo GROUP BY s),
      |jk AS (SELECT dj.deg AS j, dk.deg AS k
      |  FROM bo b JOIN deg dj ON dj.node = b.s JOIN deg dk ON dk.node = b.d),
      |agg AS (SELECT CAST(count(*) AS BIGINT) AS m2,
      |    CAST(sum(j) AS BIGINT) AS s_j,
      |    CAST(sum(j * k) AS BIGINT) AS s_jk,
      |    CAST(sum(j * j) AS BIGINT) AS s_j2 FROM jk)
      |SELECT m2, s_j, s_jk, s_j2,
      |  CAST(m2 * s_jk - s_j * s_j AS BIGINT) AS r_num,
      |  CAST(m2 * s_j2 - s_j * s_j AS BIGINT) AS r_den,
      |  CASE WHEN m2 * s_j2 - s_j * s_j > 0 THEN
      |    floor(CAST(m2 * s_jk - s_j * s_j AS DOUBLE)
      |      / CAST(m2 * s_j2 - s_j * s_j AS DOUBLE) * 100000000 + 0.5)
      |      / 100000000
      |  ELSE 0.0 END AS assortativity
      |FROM agg""".stripMargin

  /** graph_gini_degree: Gini coefficient of the folded orders graph's
    * degree distribution ([[graft.operators.Graph.degreeGini]]) — the
    * hub-inequality audit beside `graph_assortativity`'s mixing
    * coefficient. The statistic computes entirely from the (degree
    * value, count) distribution — O(distinct degrees) rows, never a
    * global per-node rank — with the rank-block sum kept DOUBLED so
    * every term is integral; one r8 IEEE division at the end. */
  val graphGiniDegree: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val m = math.max(2003L, orders.count() / 37L)
    graft.operators.Graph.degreeGini(
      orders.select(
        (col("o_custkey") % m).as("src"), (col("o_orderkey") % m).as("dst")))
  }

  val graphGiniDegreeSql =
    """WITH mm AS (SELECT greatest(2003, count(*) // 37) AS m FROM orders),
      |raw AS (SELECT o_custkey % mm.m AS src, o_orderkey % mm.m AS dst
      |  FROM orders CROSS JOIN mm),
      |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      |  FROM raw WHERE src <> dst),
      |deg AS (SELECT node, count(*) AS deg FROM (
      |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
      |  GROUP BY node),
      |dist AS (SELECT deg, count(*) AS c FROM deg GROUP BY deg),
      |p AS (SELECT deg, c, coalesce(sum(c) OVER (ORDER BY deg
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cprev
      |  FROM dist),
      |a AS (SELECT CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(deg * c) AS BIGINT) AS sum_deg,
      |    CAST(sum(deg * (2 * c * cprev + c * (c + 1))) AS BIGINT) AS s1_x2
      |  FROM p)
      |SELECT n, sum_deg, s1_x2,
      |  CAST(s1_x2 - (n + 1) * sum_deg AS BIGINT) AS g_num,
      |  CASE WHEN n * sum_deg > 0 THEN
      |    floor(CAST(s1_x2 - (n + 1) * sum_deg AS DOUBLE)
      |      / CAST(n * sum_deg AS DOUBLE) * 100000000 + 0.5) / 100000000
      |  ELSE 0.0 END AS gini
      |FROM a""".stripMargin

  /** graph_reciprocity: directed-edge mutuality of the folded orders
    * graph ([[graft.operators.Graph.reciprocity]]) — the third
    * one-scalar structural audit beside `graph_assortativity` and
    * `graph_gini_degree`: near 1 on mutual-follow graphs, near 0 on
    * citation/crawl DAGs. Integers + one r8 division. */
  val graphReciprocity: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val m = math.max(2003L, orders.count() / 37L)
    graft.operators.Graph.reciprocity(
      orders.select(
        (col("o_custkey") % m).as("src"), (col("o_orderkey") % m).as("dst")))
  }

  val graphReciprocitySql =
    """WITH mm AS (SELECT greatest(2003, count(*) // 37) AS m FROM orders),
      |e AS (SELECT DISTINCT o_custkey % mm.m AS src, o_orderkey % mm.m AS dst
      |  FROM orders CROSS JOIN mm WHERE o_custkey % mm.m <> o_orderkey % mm.m),
      |r AS (SELECT count(*) AS n_recip FROM e
      |  WHERE EXISTS (SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src)),
      |n AS (SELECT count(*) AS n_edges FROM e)
      |SELECT CAST(n.n_edges AS BIGINT) AS n_edges,
      |  CAST(r.n_recip AS BIGINT) AS n_recip,
      |  CASE WHEN n.n_edges > 0 THEN
      |    floor(CAST(r.n_recip AS DOUBLE) / CAST(n.n_edges AS DOUBLE)
      |      * 100000000 + 0.5) / 100000000
      |  ELSE 0.0 END AS reciprocity
      |FROM n CROSS JOIN r""".stripMargin

  /** ts_autocorr: lag-1/lag-2 autocovariance of each user's dense
    * 6-hour activity-count series ([[graft.operators.Temporal
    * .autocovScaled]]) — the periodicity/trend signal beside
    * `ts_seasonal`'s fixed-period decomposition. The n²-scaled centered
    * products are pure BIGINT (exact under any merge order), so the gate
    * compares integers; ac1/ac2 are single IEEE divisions on the 1e-8
    * grid. Same single-exchange shuffle profile as `ts_ewma`. */
  val tsAutocorr: Q = (s, dir) =>
    Temporal.autocovScaled(Tables.events(s, dir), "user_id",
        expr(s"(ts div 1000) div $BucketUs"), maxLag = 2)
      .orderBy("user_id")

  val tsAutocorrSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 21600000000 AS b FROM events),
      |obs AS (SELECT user_id, b, count(*) AS x FROM e GROUP BY user_id, b),
      |grid AS (SELECT user_id, unnest(range(min(b), max(b) + 1)) AS b
      |  FROM e GROUP BY user_id),
      |dense AS (SELECT g.user_id, g.b, coalesce(o.x, 0) AS x
      |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b),
      |st AS (SELECT user_id, count(*) AS n, CAST(sum(x) AS BIGINT) AS s
      |  FROM dense GROUP BY user_id),
      |y AS (SELECT d.user_id, d.b, st.n,
      |    CAST(st.n * d.x - st.s AS BIGINT) AS y
      |  FROM dense d JOIN st ON st.user_id = d.user_id),
      |l AS (SELECT user_id, n, y,
      |    lag(y, 1) OVER w AS y1, lag(y, 2) OVER w AS y2
      |  FROM y WINDOW w AS (PARTITION BY user_id ORDER BY b))
      |SELECT user_id, max(n) AS n_buckets,
      |  CAST(sum(y * y) AS BIGINT) AS c0,
      |  CAST(sum(CASE WHEN y1 IS NULL THEN 0 ELSE y * y1 END) AS BIGINT) AS c1,
      |  CAST(sum(CASE WHEN y2 IS NULL THEN 0 ELSE y * y2 END) AS BIGINT) AS c2,
      |  CASE WHEN CAST(sum(y * y) AS BIGINT) > 0 THEN
      |    floor(CAST(sum(CASE WHEN y1 IS NULL THEN 0 ELSE y * y1 END) AS DOUBLE)
      |      / CAST(sum(y * y) AS DOUBLE) * 100000000 + 0.5) / 100000000
      |    ELSE 0.0 END AS ac1,
      |  CASE WHEN CAST(sum(y * y) AS BIGINT) > 0 THEN
      |    floor(CAST(sum(CASE WHEN y2 IS NULL THEN 0 ELSE y * y2 END) AS DOUBLE)
      |      / CAST(sum(y * y) AS DOUBLE) * 100000000 + 0.5) / 100000000
      |    ELSE 0.0 END AS ac2
      |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin

  /** ts_outlier_mad: robust median/MAD anomaly flags over each user's
    * dense 6-hour activity-count series
    * ([[graft.operators.Temporal.madOutliers]], k = 3) — the
    * masking-proof sibling of `ts_anomaly`'s z-score (one huge spike
    * inflates a stddev and hides its siblings; it cannot move a
    * median). Pure BIGINT end to end — counts, discrete medians,
    * deviations, and the 3·MAD comparison — so the gate compares
    * integers only. */
  val tsOutlierMad: Q = (s, dir) =>
    Temporal.madOutliers(Tables.events(s, dir), "user_id",
        expr(s"(ts div 1000) div $BucketUs"))
      .orderBy("user_id", "b")

  val tsOutlierMadSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 21600000000 AS b FROM events),
      |obs AS (SELECT user_id, b, count(*) AS x FROM e GROUP BY user_id, b),
      |grid AS (SELECT user_id, unnest(range(min(b), max(b) + 1)) AS b
      |  FROM e GROUP BY user_id),
      |dense AS (SELECT g.user_id, g.b, coalesce(o.x, 0) AS x
      |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b),
      |med AS (SELECT user_id, quantile_disc(x, 0.5) AS med
      |  FROM dense GROUP BY user_id),
      |mad AS (SELECT d.user_id, quantile_disc(abs(d.x - m.med), 0.5) AS mad
      |  FROM dense d JOIN med m USING (user_id) GROUP BY d.user_id)
      |SELECT d.user_id, d.b, CAST(d.x AS BIGINT) AS x,
      |  CAST(m.med AS BIGINT) AS med, CAST(a.mad AS BIGINT) AS mad,
      |  CAST(abs(d.x - m.med) AS BIGINT) AS dev
      |FROM dense d JOIN med m USING (user_id) JOIN mad a USING (user_id)
      |WHERE abs(d.x - m.med) > 3 * a.mad
      |ORDER BY d.user_id, d.b""".stripMargin

  /** ts_periodogram: daily-cycle DFT power per event type — harmonics
    * 1..3 of the 24-hour period over hourly counts
    * ([[graft.operators.Temporal.periodogram]]): the frequency-domain
    * "how periodic and at which harmonic" beside `ts_seasonal`'s phase
    * means. The trig tables are integer literals computed ONCE
    * driver-side and pasted into both engines — no libm in either
    * plan; sc/ss are merge-order-proof BIGINT. */
  val tsPeriodogram: Q = (s, dir) =>
    Temporal.periodogram(Tables.events(s, dir), col("event_type"),
        expr("(ts div 1000) div 3600000000"))
      .withColumnRenamed("grp", "event_type")
      .orderBy("event_type", "k")

  val tsPeriodogramSql: String = {
    val rows = Temporal.trigMicro(24, 3)
      .map { case (k, p, c, sn) => s"($k, $p, ${c}::BIGINT, ${sn}::BIGINT)" }
      .mkString(", ")
    s"""WITH cnt AS (
       |  SELECT event_type, epoch_us(ts) // 3600000000 AS b, count(*) AS x
       |  FROM events GROUP BY 1, 2),
       |trig AS (SELECT * FROM (VALUES $rows) AS t(k, phase, c4, s4)),
       |j AS (SELECT c.event_type, t.k,
       |    CAST(sum(c.x * t.c4) AS BIGINT) AS sc,
       |    CAST(sum(c.x * t.s4) AS BIGINT) AS ss
       |  FROM cnt c JOIN trig t ON t.phase = c.b % 24
       |  GROUP BY 1, 2)
       |SELECT event_type, k, sc, ss,
       |  ${graft.functions.Num.r8Sql(
      "(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)" +
        " + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)) / 100000000.0")} AS power
       |FROM j ORDER BY event_type, k""".stripMargin
  }

  /** seq_streaks: per-user activity-streak summary over 6-hour buckets
    * ([[graft.operators.Temporal.streaks]]) — total active buckets,
    * number of maximal consecutive runs, longest run: the engagement
    * ("7-day streak") and burstiness primitive, gaps-and-islands on the
    * bucket grid. Pure integers; island id = bucket − row_number. */
  val seqStreaks: Q = (s, dir) =>
    Temporal.streaks(Tables.events(s, dir), "user_id",
        expr(s"(ts div 1000) div $BucketUs"))
      .orderBy("user_id")

  val seqStreaksSql: String =
    """WITH e AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 21600000000 AS b FROM events),
      |i AS (SELECT user_id, b,
      |    b - row_number() OVER (PARTITION BY user_id ORDER BY b) AS island
      |  FROM e),
      |runs AS (SELECT user_id, island, count(*) AS len
      |  FROM i GROUP BY user_id, island)
      |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active,
      |  CAST(count(*) AS BIGINT) AS n_streaks,
      |  CAST(max(len) AS BIGINT) AS max_streak
      |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin

  /** ts_rolling_median: centered 5-bucket rolling-median band of each
    * user's dense 6-hour activity-count series
    * ([[graft.operators.Temporal.rollingMedian]]) — the robust
    * smoother beside `ts_ewma`'s linear kernel (a one-bucket spike
    * moves an EWMA, never a 5-point median). Integer counts; the only
    * float is the even-frame middle average, bit-identical on both
    * engines; all four frame aggregates share one window sort. */
  val tsRollingMedian: Q = (s, dir) =>
    Temporal.rollingMedian(Tables.events(s, dir), "user_id",
        expr(s"(ts div 1000) div $BucketUs"))
      .orderBy("user_id", "b")

  val tsRollingMedianSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 21600000000 AS b FROM events),
      |obs AS (SELECT user_id, b, count(*) AS x FROM e GROUP BY user_id, b),
      |grid AS (SELECT user_id, unnest(range(min(b), max(b) + 1)) AS b
      |  FROM e GROUP BY user_id),
      |dense AS (SELECT g.user_id, g.b, coalesce(o.x, 0) AS x
      |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b)
      |SELECT user_id, b, CAST(x AS BIGINT) AS x,
      |  median(CAST(x AS DOUBLE)) OVER w AS med,
      |  CAST(min(x) OVER w AS BIGINT) AS lo,
      |  CAST(max(x) OVER w AS BIGINT) AS hi,
      |  CAST(count(*) OVER w AS BIGINT) AS n_frame
      |FROM dense
      |WINDOW w AS (PARTITION BY user_id ORDER BY b
      |  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
      |ORDER BY user_id, b""".stripMargin

  /** ts_double_ewma: Brown's double exponential smoothing over each
    * user's dense 6-hour activity-count series
    * ([[graft.operators.Temporal.doubleEwmaDyadic]]; K=8 dyadic
    * kernels) — level and trend estimates beside `ts_ewma`'s flat
    * smoothing. Both smoothings are INTEGER scaled lag sums; every
    * reported double is one exact-IEEE division by 2¹⁶, so the engines
    * agree bit-for-bit with no rounding grid. */
  val tsDoubleEwma: Q = (s, dir) =>
    Temporal.doubleEwmaDyadic(Tables.events(s, dir), "user_id",
        expr(s"(ts div 1000) div $BucketUs"), lags = 8)
      .orderBy("user_id", "b")

  val tsDoubleEwmaSql: String = {
    def kernel(x: String): String = (0 until 8)
      .map(k => s"coalesce(lag($x, $k) OVER w, 0) * ${1L << (7 - k)}")
      .mkString(" + ")
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) // 21600000000 AS b FROM events),
       |obs AS (SELECT user_id, b, count(*) AS x FROM e GROUP BY user_id, b),
       |grid AS (SELECT user_id, unnest(range(min(b), max(b) + 1)) AS b
       |  FROM e GROUP BY user_id),
       |dense AS (SELECT g.user_id, g.b, coalesce(o.x, 0) AS x
       |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b),
       |s1 AS (SELECT user_id, b, CAST(${kernel("x")} AS BIGINT) AS s1i
       |  FROM dense WINDOW w AS (PARTITION BY user_id ORDER BY b)),
       |s2 AS (SELECT user_id, b, s1i, CAST(${kernel("s1i")} AS BIGINT) AS s2i
       |  FROM s1 WINDOW w AS (PARTITION BY user_id ORDER BY b))
       |SELECT user_id, b, s1i, s2i,
       |  CAST(s1i AS DOUBLE) / 256.0 AS s1,
       |  CAST(s2i AS DOUBLE) / 65536.0 AS s2,
       |  CAST(s1i * 512 - s2i AS DOUBLE) / 65536.0 AS level,
       |  CAST(s1i * 256 - s2i AS DOUBLE) / 65536.0 AS trend
       |FROM s2 ORDER BY user_id, b""".stripMargin
  }

  /** ts_holt_winters: additive seasonal FORECAST per user over the 6-h
    * count series ([[graft.operators.Temporal.holtWintersDyadic]],
    * round 11 — the ts family's missing forecast member): period 4
    * (6-h buckets ⇒ daily seasonality), per-phase seasonal index
    * quantized to micro-units in pure BIGINT, dyadic double-smoothed
    * deseasonalized residual, forecast = level + trend + seasonal.
    * The integer numerators are exact-in-double (< 2⁵³) and each output
    * is ONE IEEE division by the shared constant — token-identical in
    * both engines, so the oracle replays the chain bit-for-bit. */
  val tsHoltWinters: Q = (s, dir) =>
    Temporal.holtWintersDyadic(Tables.events(s, dir), "user_id",
        expr(s"(ts div 1000) div $BucketUs"), period = 4, lags = 8)
      .orderBy("user_id", "b")

  val tsHoltWintersSql: String = {
    def kernel(x: String): String = (0 until 8)
      .map(k => s"coalesce(lag($x, $k) OVER w, 0) * ${1L << (7 - k)}")
      .mkString(" + ")
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) // 21600000000 AS b FROM events),
       |obs AS (SELECT user_id, b, count(*) AS x FROM e GROUP BY user_id, b),
       |grid AS (SELECT user_id, unnest(range(min(b), max(b) + 1)) AS b
       |  FROM e GROUP BY user_id),
       |dense AS (SELECT g.user_id, g.b, g.b % 4 AS ph, coalesce(o.x, 0) AS x
       |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b),
       |seas AS (SELECT user_id, ph,
       |    (2*1000000*sum(x) + count(*)
       |      - (((2*1000000*sum(x) + count(*)) % (2*count(*))) + 2*count(*))
       |        % (2*count(*))) // (2*count(*)) AS seasonal_q
       |  FROM dense GROUP BY user_id, ph),
       |d0 AS (SELECT d.user_id, d.b, d.x, s.seasonal_q,
       |    d.x * 1000000 - s.seasonal_q AS d
       |  FROM dense d JOIN seas s ON s.user_id = d.user_id AND s.ph = d.ph),
       |s1 AS (SELECT *, CAST(${kernel("d")} AS BIGINT) AS s1i
       |  FROM d0 WINDOW w AS (PARTITION BY user_id ORDER BY b)),
       |s2 AS (SELECT *, CAST(${kernel("s1i")} AS BIGINT) AS s2i
       |  FROM s1 WINDOW w AS (PARTITION BY user_id ORDER BY b))
       |SELECT user_id, b, x, CAST(seasonal_q AS BIGINT) AS seasonal_q,
       |  CAST(s1i * 512 - s2i AS DOUBLE) / 65536000000.0 AS level,
       |  CAST(s1i * 256 - s2i AS DOUBLE) / 65536000000.0 AS trend,
       |  CAST(s1i * 768 - s2i * 2 + seasonal_q * 65536 AS DOUBLE)
       |    / 65536000000.0 AS forecast
       |FROM s2 ORDER BY user_id, b""".stripMargin
  }

  /** ts_crosscorr: lag-0/lag-1 cross-covariance and cross-correlation
    * between every pair of event types' HOURLY global count series —
    * "do purchases track clicks, and with how much delay" — the
    * pairwise sibling of `ts_autocorr`. All series live on the shared
    * global [min,max] hourly span, so they align bucket-for-bucket;
    * c_xy(k) = Σ (n·x_t − Sx)(n·y_{t−k} − Sy) is the same n²-scaled
    * BIGINT trick (merge-order-proof, mean cleared without division);
    * ρ(k) = c_xy(k)/√(c_xx·c_yy) is a product-cast, one sqrt (IEEE
    * correctly-rounded, not libm-approximate) and one division, all on
    * the 1e-8 grid, mirrored token for token.
    *
    * Scale: the only data-wide stage is the map-side-combined
    * (type, bucket) count; everything after runs on the
    * O(types × span) frame — grid generated per type from a 1-row
    * broadcast span, one (type, b) sort for the lag, one bucket-keyed
    * self-join of the tiny aligned frame (types² pairs), final
    * aggregates O(types²). */
  val tsCrosscorr: Q = (s, dir) => {
    val hourUs = 3600000000L
    Temporal.crosscorrScaled(
      Tables.events(s, dir).select(col("event_type").as("ty"),
        expr(s"(ts div 1000) div $hourUs").as("b")))
      .orderBy("type_a", "type_b")
  }

  val tsCrosscorrSql: String =
    """WITH e AS (SELECT event_type AS ty, epoch_us(ts) // 3600000000 AS b
      |  FROM events),
      |cnt AS (SELECT ty, b, count(*) AS x FROM e GROUP BY ty, b),
      |span AS (SELECT min(b) AS b0, max(b) AS b1 FROM cnt),
      |grid AS (SELECT ty, unnest(range(s.b0, s.b1 + 1)) AS b
      |  FROM (SELECT DISTINCT ty FROM cnt) CROSS JOIN span s),
      |dense AS (SELECT g.ty, g.b, coalesce(c.x, 0) AS x
      |  FROM grid g LEFT JOIN cnt c ON c.ty = g.ty AND c.b = g.b),
      |st AS (SELECT ty, count(*) AS n, CAST(sum(x) AS BIGINT) AS s
      |  FROM dense GROUP BY ty),
      |yl AS (SELECT d.ty, d.b, CAST(st.n * d.x - st.s AS BIGINT) AS y,
      |    lag(CAST(st.n * d.x - st.s AS BIGINT)) OVER
      |      (PARTITION BY d.ty ORDER BY d.b) AS y1
      |  FROM dense d JOIN st ON st.ty = d.ty),
      |auto AS (SELECT ty, CAST(sum(y * y) AS BIGINT) AS c0 FROM yl GROUP BY ty),
      |p AS (SELECT a.ty AS type_a, bb.ty AS type_b,
      |    CAST(sum(a.y * bb.y) AS BIGINT) AS cxy0,
      |    CAST(sum(CASE WHEN bb.y1 IS NULL THEN 0 ELSE a.y * bb.y1 END)
      |      AS BIGINT) AS cxy1
      |  FROM yl a JOIN yl bb ON a.b = bb.b AND a.ty < bb.ty
      |  GROUP BY 1, 2)
      |SELECT p.type_a, p.type_b, p.cxy0, p.cxy1,
      |  ca.c0 AS caa, cb.c0 AS cbb,
      |  CASE WHEN ca.c0 > 0 AND cb.c0 > 0 THEN
      |    floor(CAST(p.cxy0 AS DOUBLE)
      |      / sqrt(CAST(ca.c0 AS DOUBLE) * CAST(cb.c0 AS DOUBLE))
      |      * 100000000 + 0.5) / 100000000 ELSE 0.0 END AS rho0,
      |  CASE WHEN ca.c0 > 0 AND cb.c0 > 0 THEN
      |    floor(CAST(p.cxy1 AS DOUBLE)
      |      / sqrt(CAST(ca.c0 AS DOUBLE) * CAST(cb.c0 AS DOUBLE))
      |      * 100000000 + 0.5) / 100000000 ELSE 0.0 END AS rho1
      |FROM p JOIN auto ca ON ca.ty = p.type_a JOIN auto cb ON cb.ty = p.type_b
      |ORDER BY type_a, type_b""".stripMargin

  /** seq_markov: first-order Markov transition matrix over each user's
    * time-ordered event-type sequence ([[graft.operators.Temporal
    * .transitionCounts]]; ties at equal ts ordered by event_id) — the
    * next-event/flow-mining estimate beside `funnel_steps`' fixed
    * funnel. Counts are integers; p is one IEEE division on the 1e-8
    * grid. One input exchange (the lag window); the pair count is
    * map-side combined down to ≤|types|² rows. */
  /** seq_trigrams: top-20 three-step user journeys
    * ([[graft.operators.Temporal.pathTrigrams]]) — the path-level view
    * above `seq_markov`'s first-order transitions (round 10). */
  val seqTrigrams: Q = (s, dir) =>
    Temporal.pathTrigrams(Tables.events(s, dir), "user_id",
      col("ts"), col("event_id"), col("event_type"), topK = 20)

  val seqTrigramsSql: String =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    lead(event_type, 1) OVER w AS s2,
      |    lead(event_type, 2) OVER w AS s3
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_type || '>' || s2 || '>' || s3 AS path, count(*) AS n
      |FROM s WHERE s2 IS NOT NULL AND s3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin

  val seqMarkov: Q = (s, dir) =>
    Temporal.transitionCounts(Tables.events(s, dir), "user_id",
        col("ts"), col("event_id"), col("event_type"))
      .orderBy("prev_state", "next_state")

  val seqMarkovSql: String =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |t AS (SELECT prev AS prev_state, event_type AS next_state,
      |    count(*) AS n_trans
      |  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_state, next_state, CAST(n_trans AS BIGINT) AS n_trans,
      |  CAST(sum(n_trans) OVER w AS BIGINT) AS n_prev,
      |  floor(CAST(n_trans AS DOUBLE) / CAST(sum(n_trans) OVER w AS DOUBLE)
      |    * 100000000 + 0.5) / 100000000 AS p
      |FROM t WINDOW w AS (PARTITION BY prev_state)
      |ORDER BY prev_state, next_state""".stripMargin

  /** graph_hits: fixed-round HITS hubs/authorities over the directed
    * part→supplier graph ([[graft.operators.Graph.hits]]; 4 rounds,
    * max-normalized integer micro-units) — the mutual-reinforcement
    * ranking beside `graph_pagerank`'s random walk. Contribution sums
    * are pure BIGINT; each renorm is the identical IEEE
    * divide·10⁸-floor chain on exact-in-double longs, so the oracle
    * unrolls the same four rounds as CTEs with no rounding-grid slack. */
  val graphHitsIters = 4

  val graphHits: Q = (s, dir) =>
    graft.operators.Graph.hits(
      Tables.lineitem(s, dir)
        .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst")),
      iters = graphHitsIters)
      .orderBy("role", "node")

  val graphHitsSql: String = {
    // each CTE is referenced exactly ONCE (the max rides a whole-frame
    // window, not a separate CTE): DuckDB inlines multi-referenced CTEs,
    // and a twice-referenced chain doubles per half-round — 2⁸ copies of
    // the edge join at 4 rounds, measured as a disk-spilling blowup at
    // sf0.1 before this form
    def norm(out: String, raw: String): String =
      s"""$out AS (SELECT node,
         |    CAST(floor(CAST(raw AS DOUBLE) / CAST(max(raw) OVER () AS DOUBLE)
         |      * 100000000.0 + 0.5) AS BIGINT) AS unit
         |  FROM $raw)""".stripMargin
    val rounds = (1 to graphHitsIters).map { i =>
      s"""a${i}r AS (SELECT e.dst AS node, CAST(sum(h.unit) AS BIGINT) AS raw
         |  FROM e JOIN h${i - 1} h ON h.node = e.src GROUP BY e.dst),
         |${norm(s"a$i", s"a${i}r")},
         |h${i}r AS (SELECT e.src AS node, CAST(sum(a.unit) AS BIGINT) AS raw
         |  FROM e JOIN a$i a ON a.node = e.dst GROUP BY e.src),
         |${norm(s"h$i", s"h${i}r")}""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem),
       |h0 AS (SELECT DISTINCT src AS node, CAST(100000000 AS BIGINT) AS unit
       |  FROM e),
       |$rounds
       |SELECT role, node, unit, CAST(unit AS DOUBLE) / 100000000.0 AS score
       |FROM (
       |  SELECT 'hub' AS role, node, unit FROM h$graphHitsIters
       |  UNION ALL
       |  SELECT 'auth' AS role, node, unit FROM a$graphHitsIters)
       |ORDER BY role, node""".stripMargin
  }

  /** rollup_incremental: algebraic incremental-view maintenance
    * ([[graft.operators.Rollup]]) — the per-customer order rollup
    * maintained as mergeable partials (count/sum/min/max), here
    * bootstrapped from a pre-1999 base batch and folded with the
    * post-1999 delta batch by MERGING PARTIALS, never re-reading the
    * base facts. Prices quantized to integer cents before the LONG sum,
    * so `merge(partials(base), partials(delta)) ≡ partials(full)` is a
    * bit-exact identity — which is exactly what the oracle checks by
    * recomputing the rollup from the full table. avg is derived at read
    * time: one IEEE division on the 1e-8 grid. */
  val rollupIncremental: Q = (s, dir) => {
    import graft.operators.Rollup
    val o = Tables.orders(s, dir)
    val cents = floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
    val split = lit("1999-01-01").cast("timestamp_ntz")
    val base = Rollup.partials(o.filter(col("o_orderdate") < split),
      Seq("o_custkey"), cents, col("o_orderdate"))
    val delta = Rollup.partials(o.filter(col("o_orderdate") >= split),
      Seq("o_custkey"), cents, col("o_orderdate"))
    Rollup.merge(Seq("o_custkey"), base, delta)
      .select(col("o_custkey"), col("n_rows"), col("sum_m").as("sum_cents"),
        col("min_o").as("first_order"), col("max_o").as("last_order"),
        graft.functions.Num.r8(col("sum_m").cast("double")
          / col("n_rows").cast("double")).as("avg_cents"))
      .orderBy("o_custkey")
  }

  val rollupIncrementalSql: String =
    """SELECT o_custkey, count(*) AS n_rows,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  min(o_orderdate) AS first_order, max(o_orderdate) AS last_order,
      |  floor(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) * 100000000 + 0.5) / 100000000 AS avg_cents
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** vec_knn_classify: k-NN majority-vote label prediction over the
    * embeddings ([[graft.operators.Similarity.knnGraphExact]], k=5 —
    * the oracle-gated exact build; at corpus scale the IVF-cell
    * candidate stage substitutes, same voting tail): each vector's
    * predicted label is the most frequent among its 5 nearest
    * neighbors, ties toward the SMALLEST label — the weak-supervision /
    * label-propagation primitive behind auto-labeling and
    * label-noise audits. Votes are integers; the argmax is one
    * struct-max aggregate (no window over the vote frame); the only
    * floats are the r4-gridded cosines inside the already-gated kNN
    * stage. */
  val vecKnnClassify: Q = (s, dir) => {
    import graft.operators.Similarity
    val emb = Tables.embeddings(s, dir)
    val knn = Similarity.knnGraphExact(emb, 5)
    val lbl = emb.select(col("vec_id"), col("label").cast("long"))
    knn
      .join(lbl.select(col("vec_id").as("dst"), col("label").as("nl")), "dst")
      .groupBy("src", "nl").agg(count(lit(1)).as("cnt"))
      .groupBy("src").agg(max(struct(col("cnt"), (-col("nl")).as("mnl"))).as("m"))
      .select(col("src").as("vec_id"), (-col("m.mnl")).as("pred_label"),
        col("m.cnt").as("n_votes"))
      .join(lbl.select(col("vec_id"), col("label").as("true_label")), "vec_id")
      .select(col("vec_id"), col("true_label"), col("pred_label"), col("n_votes"))
      .orderBy("vec_id")
  }

  val vecKnnClassifySql: String =
    """WITH p AS (
      |  SELECT a.vec_id AS src, b.vec_id AS dst, floor((
      |    list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS cosine
      |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
      |r AS (SELECT src, dst,
      |    row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rk
      |  FROM p),
      |v AS (SELECT r.src, CAST(e.label AS BIGINT) AS nl
      |  FROM r JOIN embeddings e ON e.vec_id = r.dst WHERE r.rk <= 5),
      |c AS (SELECT src, nl, count(*) AS cnt FROM v GROUP BY 1, 2),
      |a AS (SELECT src, nl, cnt,
      |    row_number() OVER (PARTITION BY src ORDER BY cnt DESC, nl ASC) AS rn
      |  FROM c)
      |SELECT a.src AS vec_id, CAST(e.label AS BIGINT) AS true_label,
      |  a.nl AS pred_label, CAST(a.cnt AS BIGINT) AS n_votes
      |FROM a JOIN embeddings e ON e.vec_id = a.src
      |WHERE a.rn = 1 ORDER BY vec_id""".stripMargin

  val all: Map[String, Q] = Map(
    "dedup_embedding_quant" -> dedupEmbeddingQuant,
    "graph_bfs" -> graphBfs,
    "graph_pagerank" -> graphPagerank,
    "graph_ppr" -> graphPpr,
    "graph_katz" -> graphKatz,
    "seq_trigrams" -> seqTrigrams,
    "graph_label_prop" -> graphLabelProp,
    "graph_modularity" -> graphModularity,
    "graph_adamic_adar" -> graphAdamicAdar,
    "graph_jaccard" -> graphJaccard,
    "graph_triangle_count" -> graphTriangleCount,
    "graph_clustering_coeff" -> graphClusteringCoeff,
    "graph_assortativity" -> graphAssortativity,
    "graph_gini_degree" -> graphGiniDegree,
    "graph_reciprocity" -> graphReciprocity,
    "graph_kcore" -> graphKcore,
    "graph_hits" -> graphHits,
    "graph_cc_incremental" -> graphCcIncremental,
    "dq_audit" -> dqAudit,
    "dq_drift_psi" -> dqDriftPsi,
    "dq_drift_ks" -> dqDriftKs,
    "dq_benford" -> dqBenford,
    "agg_regression" -> aggRegression,
    "agg_bitmap_distinct" -> aggBitmapDistinct,
    "ts_resample" -> tsResample,
    "ts_interpolate" -> tsInterpolate,
    "ts_ewma" -> tsEwma,
    "ts_anomaly" -> tsAnomaly,
    "ts_changepoint" -> tsChangepoint,
    "ts_seasonal" -> tsSeasonal,
    "ts_autocorr" -> tsAutocorr,
    "ts_double_ewma" -> tsDoubleEwma,
    "ts_holt_winters" -> tsHoltWinters,
    "ts_rolling_median" -> tsRollingMedian,
    "ts_outlier_mad" -> tsOutlierMad,
    "seq_streaks" -> seqStreaks,
    "ts_periodogram" -> tsPeriodogram,
    "ts_crosscorr" -> tsCrosscorr,
    "seq_markov" -> seqMarkov,
    "rollup_incremental" -> rollupIncremental,
    "scd2_intervals" -> scd2Intervals,
    "scd2_incremental" -> scd2Incremental,
    "ts_rolling_slope" -> tsRollingSlope,
    "funnel_steps" -> funnelSteps,
    "retention_cohorts" -> retentionCohorts,
    "sample_reservoir" -> sampleReservoir,
    "join_bloom" -> joinBloom,
    "join_interval_bucketed" -> joinIntervalBucketed,
    "join_box_2d" -> joinBox2d,
    "vec_quantize_int8" -> vecQuantizeInt8,
    "vec_project_rp" -> vecProjectRp,
    "vec_centroids" -> vecCentroids,
    "cluster_kmeans" -> clusterKmeans,
    "cluster_kmeans_centroids" -> clusterKmeansCentroids,
    "cluster_kmeans_assign" -> clusterKmeansAssign,
    "curate_cluster_balance" -> curateClusterBalance,
    "vec_top_pc" -> vecTopPc,
    "vec_whiten_resid" -> vecWhitenResid,
    "vec_pq_codes" -> vecPqCodes,
    "vec_pq_search" -> vecPqSearch,
    "vec_ivf_pq_search" -> vecIvfPqSearch,
    "vec_knn_classify" -> vecKnnClassify,
    "curate_semdedup" -> curateSemdedup,
    "eval_ann_recall" -> evalAnnRecall,
    "eval_pq_recall" -> evalPqRecall
  )

  val oracles: Map[String, String] = Map(
    "dedup_embedding_quant" -> dedupEmbeddingQuantSql,
    "graph_bfs" -> graphBfsSql,
    "graph_pagerank" -> graphPagerankSql,
    "graph_ppr" -> graphPprSql,
    "graph_katz" -> graphKatzSql,
    "seq_trigrams" -> seqTrigramsSql,
    "graph_label_prop" -> graphLabelPropSql,
    "graph_modularity" -> graphModularitySql,
    "graph_adamic_adar" -> graphAdamicAdarSql,
    "graph_jaccard" -> graphJaccardSql,
    "graph_triangle_count" -> graphTriangleCountSql,
    "graph_clustering_coeff" -> graphClusteringCoeffSql,
    "graph_assortativity" -> graphAssortativitySql,
    "graph_gini_degree" -> graphGiniDegreeSql,
    "graph_reciprocity" -> graphReciprocitySql,
    "graph_kcore" -> graphKcoreSql,
    "graph_hits" -> graphHitsSql,
    "graph_cc_incremental" -> graphCcIncrementalSql,
    "dq_audit" -> dqAuditSql,
    "dq_drift_psi" -> dqDriftPsiSql,
    "dq_drift_ks" -> dqDriftKsSql,
    "dq_benford" -> dqBenfordSql,
    "agg_regression" -> aggRegressionSql,
    "agg_bitmap_distinct" -> aggBitmapDistinctSql,
    "ts_resample" -> tsResampleSql,
    "ts_interpolate" -> tsInterpolateSql,
    "ts_ewma" -> tsEwmaSql,
    "ts_anomaly" -> tsAnomalySql,
    "ts_changepoint" -> tsChangepointSql,
    "ts_seasonal" -> tsSeasonalSql,
    "ts_autocorr" -> tsAutocorrSql,
    "ts_double_ewma" -> tsDoubleEwmaSql,
    "ts_holt_winters" -> tsHoltWintersSql,
    "ts_rolling_median" -> tsRollingMedianSql,
    "ts_outlier_mad" -> tsOutlierMadSql,
    "seq_streaks" -> seqStreaksSql,
    "ts_periodogram" -> tsPeriodogramSql,
    "ts_crosscorr" -> tsCrosscorrSql,
    "seq_markov" -> seqMarkovSql,
    "rollup_incremental" -> rollupIncrementalSql,
    "scd2_intervals" -> scd2IntervalsSql,
    "scd2_incremental" -> scd2IncrementalSql,
    "ts_rolling_slope" -> tsRollingSlopeSql,
    "funnel_steps" -> funnelStepsSql,
    "retention_cohorts" -> retentionCohortsSql,
    "sample_reservoir" -> sampleReservoirSql,
    "join_bloom" -> joinBloomSql,
    "join_interval_bucketed" -> joinIntervalBucketedSql,
    "join_box_2d" -> joinBox2dSql,
    "vec_quantize_int8" -> vecQuantizeInt8Sql,
    "vec_project_rp" -> vecProjectRpSql,
    "vec_centroids" -> vecCentroidsSql,
    "cluster_kmeans" -> clusterKmeansSql,
    "cluster_kmeans_centroids" -> clusterKmeansCentroidsSql,
    "cluster_kmeans_assign" -> clusterKmeansAssignSql,
    "curate_cluster_balance" -> curateClusterBalanceSql,
    "vec_top_pc" -> vecTopPcSql,
    "vec_whiten_resid" -> vecWhitenResidSql,
    "vec_pq_codes" -> vecPqCodesSql,
    "vec_pq_search" -> vecPqSearchSql,
    "vec_ivf_pq_search" -> vecIvfPqSearchSql,
    "vec_knn_classify" -> vecKnnClassifySql,
    "curate_semdedup" -> curateSemdedupSql,
    "eval_ann_recall" -> evalAnnRecallSql,
    "eval_pq_recall" -> evalPqRecallSql
  )
}

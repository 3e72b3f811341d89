package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.operators.{BloomJoin, RangeJoin, Temporal}

/** Unit coverage for the round-3 analytics operators (QueriesAnalytics):
  * hand-computed expectations on crafted frames, plus equivalence of the
  * scale-path joins against their naive forms on the fixture. */
class AnalyticsSpec extends SparkTestBase {

  import spark.implicits._

  test("resampleFill fills gaps with the last observed bucket value") {
    val e = Seq(
      (1L, 0L, 1.0), (1L, 0L, 2.0), // bucket 0 -> 3.0
      (1L, 3L, 5.0),                // buckets 1,2 empty -> carry 3.0
      (2L, 10L, 7.0)                // single-bucket series
    ).toDF("user_id", "b", "value")
    val out = Temporal.resampleFill(e, "user_id", col("b"), col("value"),
        v => sum(v)).orderBy("user_id", "b")
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq(
      (1L, 0L, 3.0), (1L, 1L, 3.0), (1L, 2L, 3.0), (1L, 3L, 5.0),
      (2L, 10L, 7.0)))
  }

  test("resampleInterp draws the straight line across gaps, keeps observed values") {
    val e = Seq(
      (1L, 0L, 1.0), (1L, 0L, 2.0), // bucket 0 -> 3.0 observed
      (1L, 3L, 9.0),                // buckets 1,2 -> 5.0, 7.0 (linear)
      (1L, 4L, 1.0),                // adjacent observed, nothing to fill
      (2L, 10L, 7.0)                // single-bucket series
    ).toDF("user_id", "b", "value")
    val out = Temporal.resampleInterp(e, "user_id", col("b"), col("value"),
        v => sum(v)).orderBy("user_id", "b")
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq(
      (1L, 0L, 3.0), (1L, 1L, 5.0), (1L, 2L, 7.0), (1L, 3L, 9.0),
      (1L, 4L, 1.0),
      (2L, 10L, 7.0)))
  }

  test("resampleInterp interpolates DOWNWARD slopes and multi-bucket gaps exactly") {
    val e = Seq(
      (1L, 0L, 8.0), (1L, 4L, 0.0) // 3 gap buckets: 6.0, 4.0, 2.0
    ).toDF("user_id", "b", "value")
    val out = Temporal.resampleInterp(e, "user_id", col("b"), col("value"),
        v => sum(v)).orderBy("b").as[(Long, Long, Double)].collect()
    assert(out.map(_._3).toSeq === Seq(8.0, 6.0, 4.0, 2.0, 0.0))
  }

  test("ewmaDyadic: hand-computed dyadic weights, gap buckets count 0, zero-primed head") {
    // key 1 events: bucket 0 x2, bucket 2 x1 (bucket 1 empty -> x=0)
    val e = Seq((1L, 0L), (1L, 0L), (1L, 2L), (2L, 5L))
      .toDF("user_id", "b")
    val out = Temporal.ewmaDyadic(e, "user_id", col("b"), lags = 3)
      .orderBy("user_id", "b").as[(Long, Long, Double)].collect().toSeq
    // weights 1/2, 1/4, 1/8 over (x_t, x_{t-1}, x_{t-2}), missing lags 0:
    // b0: 2/2 = 1.0 ; b1: 0/2 + 2/4 = 0.5 ; b2: 1/2 + 0/4 + 2/8 = 0.75
    assert(out === Seq(
      (1L, 0L, 1.0), (1L, 1L, 0.5), (1L, 2L, 0.75),
      (2L, 5L, 0.5)))
  }

  test("ewmaDyadic: constant series converges to x * (1 - 2^-K)") {
    // one event per bucket 0..9: after >= K buckets the weighted sum is
    // sum_{k=0..K-1} 2^-(k+1) = 1 - 2^-K exactly (dyadic arithmetic)
    val e = (0L to 9L).map(b => (1L, b)).toDF("user_id", "b")
    val out = Temporal.ewmaDyadic(e, "user_id", col("b"), lags = 4)
      .orderBy("b").as[(Long, Long, Double)].collect()
    assert(out.last._3 === (1.0 - math.pow(2.0, -4)))
  }

  test("scd2 collapses runs into [eff_from, eff_to) with an open tail") {
    val e = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "a"), (1L, 30L, 102L, "b"),
      (1L, 40L, 103L, "a"),
      (2L, 10L, 200L, "x")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Temporal.scd2(e, "user_id", col("ts"), col("event_id"), col("event_type"))
      .select("user_id", "run", "attr", "eff_from", "eff_to", "n_rows")
      .orderBy("user_id", "run")
      .as[(Long, Long, String, Long, Option[Long], Long)].collect()
    assert(out.toSeq === Seq(
      (1L, 1L, "a", 10L, Some(30L), 2L),
      (1L, 2L, "b", 30L, Some(40L), 1L),
      (1L, 3L, "a", 40L, None, 1L),
      (2L, 1L, "x", 10L, None, 1L)))
  }

  test("scd2 ties on ts break by the tie column, not arbitrarily") {
    val e = Seq( // same ts, event_id decides order: a(1), b(2)
      (1L, 10L, 2L, "b"), (1L, 10L, 1L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Temporal.scd2(e, "user_id", col("ts"), col("event_id"), col("event_type"))
      .orderBy("run").select("attr").as[String].collect()
    assert(out.toSeq === Seq("a", "b"))
  }

  test("funnel: first stepB strictly after first stepA, per key") {
    val e = Seq(
      (1L, 10L, "signup"), (1L, 5L, "purchase"),  // purchase BEFORE signup: no conversion
      (1L, 30L, "purchase"), (1L, 40L, "purchase"), // first after = 30
      (2L, 10L, "signup"),                          // never converts
      (3L, 10L, "purchase")                         // no signup: not in funnel
    ).toDF("user_id", "ts", "event_type")
    val out = Temporal.funnel(e, "user_id", col("ts"), col("event_type"),
        "signup", "purchase")
      .orderBy("user_id")
      .as[(Long, Long, Option[Long])].collect()
    assert(out.toSeq === Seq((1L, 10L, Some(30L)), (2L, 10L, None)))
  }

  test("overlapSelfBucketed equals the naive non-equi self-join on the fixture") {
    val base = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("sd"))
    val len = 7
    val bucketed = RangeJoin.overlapSelfBucketed(base, "o_orderkey", "sd", len, bucket = 7)
      .select(col("a_o_orderkey").as("ka"), col("b_o_orderkey").as("kb"))
    val a = base.select(col("o_orderkey").as("ka"), col("sd").as("sa"))
    val b = base.select(col("o_orderkey").as("kb"), col("sd").as("sb"))
    val naive = a.join(b, col("ka") < col("kb") &&
      col("sa") < col("sb") + len && col("sb") < col("sa") + len)
      .select("ka", "kb")
    assert(bucketed.count() === naive.count()) // no duplicate pairs
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty)
  }

  test("boxJoin2d: equals the brute-force box predicate; cell-boundary pairs found once") {
    import graft.operators.BoxJoin
    // points straddling cell boundaries in both dims (eps 2.0 / 1.0):
    // cells at x=1.9|2.1 differ, y=0.9|1.1 differ — neighbors must catch
    val pts = Seq((1L, 1.9, 0.9), (2L, 2.1, 1.1), (3L, 3.8, 1.9),
      (4L, 10.0, 5.0), (5L, 2.0, 1.0), (6L, 1.0, 3.0))
    val df = pts.toDF("id", "x", "y")
    val got = BoxJoin.selfJoin2d(df, "id", "x", "y", epsX = 2.0, epsY = 1.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    val want = (for {
      (a, ax, ay) <- pts; (b, bx, by) <- pts
      if a < b && math.abs(ax - bx) <= 2.0 && math.abs(ay - by) <= 1.0
    } yield (a, b)).sorted
    assert(got === want, s"got $got want $want")
    assert(got.nonEmpty && got.distinct === got, "dup-free without distinct")
  }

  test("overlapSelfBucketed: interval length not a multiple of the bucket") {
    val iv = Seq((1L, 0L), (2L, 9L), (3L, 10L), (4L, 25L)).toDF("id", "s")
    // len=11: [0,11) x [9,20) overlap; [9,20) x [10,21) overlap; 25 alone
    val got = RangeJoin.overlapSelfBucketed(iv, "id", "s", len = 11, bucket = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("semiWithBloom is bit-identical to the plain semi-join") {
    val dim = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val withBloom = BloomJoin.semiWithBloom(orders, "o_custkey", dim, "c_custkey", 1000L)
    val plain = orders.join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
    assert(withBloom.exceptAll(plain).isEmpty && plain.exceptAll(withBloom).isEmpty)
  }

  test("semiWithBloom handles string, mixed-width integral, and double keys") {
    val dim = Tables.nation(spark, sf).select("n_name")
    val facts = Tables.nation(spark, sf).select(col("n_name").as("k"), col("n_nationkey"))
      .unionAll(Seq(("NOT-A-NATION", 99L)).toDF("k", "n_nationkey"))
    val withBloom = BloomJoin.semiWithBloom(facts, "k", dim, "n_name", 100L)
    val plain = facts.join(dim, col("k") === col("n_name"), "left_semi")
    assert(withBloom.exceptAll(plain).isEmpty && plain.exceptAll(withBloom).isEmpty)
    // mixed integral widths: xxhash64 is width-sensitive, so both sides
    // must be widened to BIGINT before hashing or every probe misses
    val factsL = Tables.orders(spark, sf).select("o_orderkey", "o_custkey") // BIGINT key
    val dimI = Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").cast("int").as("ck")) // INT key
    val bloomI = BloomJoin.semiWithBloom(factsL, "o_custkey", dimI, "ck", 1000L)
    val plainI = factsL.join(dimI, col("o_custkey") === col("ck"), "left_semi")
    assert(bloomI.count() > 0)
    assert(bloomI.exceptAll(plainI).isEmpty && plainI.exceptAll(bloomI).isEmpty)
    // the codegen'd xxhash64 probe lifts the old integral/string-only
    // restriction: double keys work too
    val factsD = facts.withColumn("k", col("n_nationkey").cast("double"))
    val dimD = Tables.nation(spark, sf)
      .filter(col("n_regionkey") === 1).select(col("n_nationkey").cast("double").as("nk"))
    val bloomD = BloomJoin.semiWithBloom(factsD, "k", dimD, "nk", 100L)
    val plainD = factsD.join(dimD, col("k") === col("nk"), "left_semi")
    assert(bloomD.exceptAll(plainD).isEmpty && plainD.exceptAll(bloomD).isEmpty)
  }

  test("semiWithBloom string-vs-numeric keys: coercion matches survive (no sketch false negative)") {
    // Under ANSI coercion the build STRING "007" join-matches probe BIGINT 7,
    // but xxhash64("007") != xxhash64("7") under any single-type hash — so
    // the mixed pair must bypass the sketch and still return the match.
    val facts = Seq(7L, 8L, 99L).toDF("k")
    val dim = Seq("007", "8").toDF("sk")
    val withBloom = BloomJoin.semiWithBloom(facts, "k", dim, "sk", 10L)
    val plain = facts.join(dim, col("k") === col("sk"), "left_semi")
    val got = withBloom.as[Long].collect().toSet
    assert(got === plain.as[Long].collect().toSet)
    assert(got === Set(7L, 8L), "coercion-equal pairs must not be dropped")
    // int-vs-double mixed numerics hash at DOUBLE on both sides: identical
    val factsI = Seq(1, 2, 5).toDF("k")
    val dimD = Seq(1.0d, 2.0d, 3.0d).toDF("dk")
    val bloomMix = BloomJoin.semiWithBloom(factsI, "k", dimD, "dk", 10L)
    val plainMix = factsI.join(dimD, col("k") === col("dk"), "left_semi")
    assert(bloomMix.as[Int].collect().toSet === plainMix.as[Int].collect().toSet)
    assert(bloomMix.as[Int].collect().toSet === Set(1, 2))
  }

  test("semiWithBloom on an empty build side returns the empty semi-join") {
    val dim = Tables.nation(spark, sf).filter(lit(false)).select("n_name")
    val facts = Tables.nation(spark, sf).select(col("n_name").as("k"))
    assert(BloomJoin.semiWithBloom(facts, "k", dim, "n_name", 100L).count() === 0)
  }

  test("int8Scale zero-vector guard: all-zero embedding quantizes to zeros, not NaN") {
    val df = Seq((1L, Seq(0f, 0f, 0f, 0f)), (2L, Seq(1f, -2f, 3f, -4f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .withColumn("scl", VectorOps.int8Scale(col("embedding")))
      .withColumn("qv", VectorOps.quantizeInt8(col("embedding"), col("scl")))
    val rows = df.orderBy("vec_id").collect()
    assert(rows(0).getSeq[Long](3).forall(_ == 0L))
    // non-zero vectors are untouched by the clamp: scale is still absMax/127
    assert(math.abs(rows(1).getDouble(2) - 4.0 / 127.0) < 1e-12)
  }

  test("quantizeInt8: codes bounded by ±127 and dequantize error ≤ scale/2") {
    val df = Tables.embeddings(spark, sf).limit(50)
      .withColumn("scl", VectorOps.int8Scale(col("embedding")))
      .withColumn("qv", VectorOps.quantizeInt8(col("embedding"), col("scl")))
    val bad = df.select(
      aggregate(col("qv"), lit(0), (acc, x) =>
        acc + when(abs(x) > 127, 1).otherwise(0)).as("oob"),
      aggregate(zip_with(col("embedding"), col("qv"),
          (e, q) => abs(e.cast("double") - q * col("scl"))),
        lit(0.0), (acc, d) => greatest(acc, d)).as("maxerr"),
      (col("scl") / 2 + lit(1e-12)).as("halfscale"))
      .filter(col("oob") > 0 || col("maxerr") > col("halfscale"))
    assert(bad.isEmpty, "quantization out of bounds or error above scale/2")
  }

  test("quantization-bucket dedup collapses near-identical vectors") {
    val v = Array.tabulate(4)(i => (i + 1).toFloat)         // [1,2,3,4]
    val nearDup = v.clone(); nearDup(0) = 1.01f             // < half a step away
    val far = v.map(-_)                                     // different bucket
    val df = Seq((1L, v.toSeq), (2L, nearDup.toSeq), (3L, far.toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = df
      .withColumn("scl", VectorOps.absMax(col("embedding")) / lit(3.0))
      .withColumn("qv", VectorOps.quantizeInt8(col("embedding"), col("scl")))
      .groupBy("qv").agg(min("vec_id").as("rep_id"), count(lit(1)).as("n"))
      .select("rep_id", "n").orderBy("rep_id")
      .as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 2L), (3L, 1L))) // 1+2 collapse, 3 alone
  }

  test("bitmap distinct equals countDistinct on the fixture") {
    val got = QueriesAnalytics.aggBitmapDistinct(spark, sf)
      .as[(String, Long)].collect().toMap
    val want = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("ndv"))
      .as[(String, Long)].collect().toMap
    assert(got === want)
  }

  test("regression slope/intercept reproduce the closed-form fit") {
    val df = Seq((1.0, 3.0), (2.0, 5.0), (3.0, 7.0)).toDF("x", "y") // y = 2x+1
    val r = df.agg(
      expr("regr_slope(y, x)").as("m"), expr("regr_intercept(y, x)").as("b"),
      expr("regr_r2(y, x)").as("r2")).head()
    assert(math.abs(r.getDouble(0) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("bfs: exact distances on a crafted graph with cycle, tie, and unreachable node") {
    import graft.operators.Graph
    //  1→2→3→4 (chain), 1→5, 5→4 (shortcut: 4 at dist 2), 4→1 (cycle),
    //  9→1 (unreachable FROM 1: directed), 7 isolated (never appears)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (5L, 4L), (4L, 1L), (9L, 1L))
      .toDF("src", "dst")
    val got = Graph.bfs(e, seed = 1L, maxDepth = 10)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 5L -> 1, 3L -> 2, 4L -> 2))
  }

  test("bfs: depth cap truncates the frontier exactly") {
    import graft.operators.Graph
    val chain = (1L to 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Graph.bfs(chain, seed = 1L, maxDepth = 3)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("dqCheck counts violations on dirty data; dqCheckFk finds orphans") {
    import graft.operators.Relational.{dqCheck, dqCheckFk}
    val fact = Seq((1L, 10.0), (2L, -3.0), (3L, 0.0), (9L, 5.0))
      .toDF("fk", "amount")
    val dim = Seq(1L, 2L, 3L).toDF("id")
    val range = dqCheck(fact, "amount_positive", col("amount") <= 0)
      .as[(String, Long, Long)].head()
    assert(range === ("amount_positive", 2L, 4L))
    val fk = dqCheckFk(fact, col("fk"), dim, col("id"), "fact_fk_dim")
      .as[(String, Long, Long)].head()
    assert(fk === ("fact_fk_dim", 1L, 4L)) // fk=9 has no dim row
    // a DUPLICATED dim key (the dirty data the audit targets) must not
    // multiply matched fact rows and inflate the denominator
    val dirtyDim = Seq(1L, 1L, 2L, 3L).toDF("id")
    val fkDirty = dqCheckFk(fact, col("fk"), dirtyDim, col("id"), "fact_fk_dim")
      .as[(String, Long, Long)].head()
    assert(fkDirty === ("fact_fk_dim", 1L, 4L))
    // SQL FK semantics: a NULL foreign key SATISFIES the constraint
    val nullFact = Seq(Some(1L), None, Some(9L)).toDF("fk")
    val fkNull = dqCheckFk(nullFact, col("fk"), dim, col("id"), "fact_fk_dim")
      .as[(String, Long, Long)].head()
    assert(fkNull === ("fact_fk_dim", 1L, 3L)) // only fk=9 violates
    // a clean table reports zero violations, full checked count
    val clean = dqCheck(dim, "id_nonnull", col("id").isNull)
      .as[(String, Long, Long)].head()
    assert(clean === ("id_nonnull", 0L, 3L))
  }

  test("ts_anomaly: hand-computed z-scores, zero-variance guard, per-group z sums to ~0 (round 9)") {
    import graft.operators.Temporal
    // group a: bucket counts 1, 1, 4 → mean 2, varPop 2, z = ±1/√2, +√2
    // group b: counts 2, 2 → variance 0 → guard pins z to 0.0
    val ev = Seq(
      ("a", 0L), ("a", 1L), ("a", 2L), ("a", 2L), ("a", 2L), ("a", 2L),
      ("b", 0L), ("b", 0L), ("b", 1L), ("b", 1L)
    ).toDF("grp", "bucket")
    val got = Temporal.volumeAnomaly(ev, col("grp"), col("bucket"))
      .orderBy("grp", "bucket")
      .as[(String, Long, Long, Double)].collect().toSeq
    val inv = 1.0 / math.sqrt(2.0)
    def r4d(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(got == Seq(
      ("a", 0L, 1L, r4d(-inv)), ("a", 1L, 1L, r4d(-inv)), ("a", 2L, 4L, r4d(2 * inv)),
      ("b", 0L, 2L, 0.0), ("b", 1L, 2L, 0.0)), got.toString)
    // fixture invariant: per-type z sums to ~0 (Σ(c − mean) = 0 exactly;
    // only the r4 rounding moves it off zero)
    val sums = QueriesAnalytics.all("ts_anomaly")(spark, sf)
      .groupBy("event_type").agg(sum("z").as("sz"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect()
    sums.foreach { case (t, sz, n) =>
      assert(math.abs(sz) <= n * 1e-4, s"$t: z sum $sz over $n buckets")
    }
  }

  test("ts_seasonal: phase means and residuals, hand-computed at period 2") {
    import graft.operators.Temporal
    // counts per bucket: 0→2, 1→4, 2→6, 3→4. phase 0 = {0,2}: mean 4,
    // resid −2/+2; phase 1 = {1,3}: mean 4, resid 0/0.
    val ev = Seq(0L -> 2, 1L -> 4, 2L -> 6, 3L -> 4)
      .flatMap { case (b, n) => Seq.fill(n)(("a", b)) }.toDF("g", "b")
    val got = Temporal.seasonalResiduals(ev, col("g"), col("b"), period = 2)
      .orderBy("bucket")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      ("a", 0L, 0L, 2L, 4.0, -2.0), ("a", 1L, 1L, 4L, 4.0, 0.0),
      ("a", 2L, 0L, 6L, 4.0, 2.0), ("a", 3L, 1L, 4L, 4.0, 0.0)), got.toString)
    // fixture invariant: residuals sum to ~0 within every (type, phase)
    val sums = QueriesAnalytics.all("ts_seasonal")(spark, sf)
      .groupBy("event_type", "phase").agg(sum("resid").as("sr"), count(lit(1)).as("n"))
      .as[(String, Long, Double, Long)].collect()
    sums.foreach { case (t, h, sr, n) =>
      assert(math.abs(sr) <= n * 1e-8 + 1e-9, s"$t/$h: resid sum $sr over $n")
    }
  }

  test("ts_changepoint: CUSUM argmax lands on the level shift; ties break earliest (round 9)") {
    import graft.operators.Temporal
    // group a: counts 2,2,2,8,8,8 at buckets 1..6 — the break is after
    // bucket 3. n·S_t = n·prefix − t·total: 18,36,54,36,18,0 → max 54 @ 3.
    // group b: flat 5,5 — every |n·S_t| is 0 → tie breaks to bucket 10.
    val counts = Seq(
      ("a", 1L, 2L), ("a", 2L, 2L), ("a", 3L, 2L),
      ("a", 4L, 8L), ("a", 5L, 8L), ("a", 6L, 8L),
      ("b", 10L, 5L), ("b", 11L, 5L)
    ).toDF("grp", "bucket", "n_events")
    val got = Temporal.cusumOverCounts(counts).orderBy("grp")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 3L, 54L, 6L, 30L), ("b", 10L, 0L, 2L, 10L)), got.toString)
    // event-level wrapper: one row per distinct group, exact totals
    val ev = Seq(("a", 0L), ("a", 0L), ("a", 1L), ("b", 5L))
      .toDF("g", "b")
    val w = Temporal.cusumChangepoint(ev, col("g"), col("b"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // a: counts 2,1 → stats |2·2−1·3|=1, |2·3−2·3|=0 → cp bucket 0
    assert(w == Seq(("a", 0L, 1L, 2L, 3L), ("b", 5L, 0L, 1L, 1L)), w.toString)
  }

  test("ts_autocorr: hand-computed n²-scaled autocovariance, gaps count as zero (round 9)") {
    // key a: counts [2,4,6] at buckets 0..2 → n=3, S=12, y=3x−12=[−6,0,6]
    //   c0 = 36+0+36 = 72; c1 = 0·(−6)+6·0 = 0; c2 = 6·(−6) = −36
    //   ac1 = 0.0, ac2 = −0.5
    // key b: observed buckets 0 and 2 (count 1 each) → dense x=[1,0,1],
    //   n=3, S=2, y=[1,−2,1]; c0=6, c1=−4, c2=1
    //   ac1 = r8(−2/3) = −0.66666667, ac2 = r8(1/6) = 0.16666667
    val ev = (Seq.fill(2)(("a", 0L)) ++ Seq.fill(4)(("a", 1L)) ++
        Seq.fill(6)(("a", 2L)) ++ Seq(("b", 0L), ("b", 2L)))
      .toDF("g", "b")
    val got = Temporal.autocovScaled(ev, "g", col("b"), maxLag = 2)
      .orderBy("g")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      ("a", 3L, 72L, 0L, -36L, 0.0, -0.5),
      ("b", 3L, 6L, -4L, 1L, -0.66666667, 0.16666667)), got.toString)
  }

  test("seq_markov: transition counts and ML probabilities, ties ordered by tie column (round 9)") {
    // u1: a,b,a,b → a→b ×2, b→a ×1; u2: b,b → b→b ×1
    // equal-ts pair in u2 ordered by the tie column (ids 20 < 21)
    val ev = Seq(
      (1L, 10L, 100L, "a"), (1L, 11L, 101L, "b"),
      (1L, 12L, 102L, "a"), (1L, 13L, 103L, "b"),
      (2L, 50L, 20L, "b"), (2L, 50L, 21L, "b")
    ).toDF("user_id", "t", "id", "et")
    val got = Temporal.transitionCounts(ev, "user_id", col("t"), col("id"),
        col("et"))
      .orderBy("prev_state", "next_state")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("a", "b", 2L, 2L, 1.0),
      ("b", "a", 1L, 2L, 0.5),
      ("b", "b", 1L, 2L, 0.5)), got.toString)
  }

  test("seq_trigrams: hand-replayed 3-step paths, per-key ordering, top-k tie-break (round 10)") {
    // u1: a,b,a,b → paths a>b>a, b>a>b; u2: c,c,c,c → c>c>c ×2
    // equal-ts pair in u2 ordered by the tie column
    val ev = Seq(
      (1L, 10L, 100L, "a"), (1L, 11L, 101L, "b"),
      (1L, 12L, 102L, "a"), (1L, 13L, 103L, "b"),
      (2L, 50L, 20L, "c"), (2L, 50L, 21L, "c"),
      (2L, 51L, 22L, "c"), (2L, 52L, 23L, "c")
    ).toDF("user_id", "t", "id", "et")
    val got = Temporal.pathTrigrams(ev, "user_id", col("t"), col("id"),
        col("et"), topK = 3)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("c>c>c", 2L), ("a>b>a", 1L), ("b>a>b", 1L)), got.toString)
  }

  test("ts_double_ewma: hand-computed K=2 Brown smoothing, all divisions exact dyadic (round 9)") {
    // x=[1,2,4]: s1i = 2x_t + x_{t−1} → [2,5,10] (scale 4);
    // s2i = 2·s1i_t + s1i_{t−1} → [4,12,25] (scale 16);
    // level = (8·s1i − s2i)/16; trend = (4·s1i − s2i)/16.
    val ev = (Seq.fill(1)(("a", 0L)) ++ Seq.fill(2)(("a", 1L)) ++
        Seq.fill(4)(("a", 2L))).toDF("g", "b")
    val got = Temporal.doubleEwmaDyadic(ev, "g", col("b"), lags = 2)
      .orderBy("b")
      .as[(String, Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got === Seq(
      ("a", 0L, 2L, 4L, 0.5, 0.25, 0.75, 0.25),
      ("a", 1L, 5L, 12L, 1.25, 0.75, 1.75, 0.5),
      ("a", 2L, 10L, 25L, 2.5, 1.5625, 3.4375, 0.9375)), got.toString)
  }

  test("ts_holt_winters: driver-replayed decomposition; exactly-periodic series forecasts itself (round 11)") {
    import graft.operators.Temporal
    // a PURE period-2 series [3,7,3,7,…]: seasonal means are exact
    // (3 and 7), the deseasonalized residual is identically ZERO, so
    // level = trend = 0 and forecast == the seasonal index — the
    // decomposition's fixed point, hand-checkable without the kernel
    val ev = (0L until 8L).flatMap(b =>
      Seq.fill(if (b % 2 == 0) 3 else 7)(("u", b))).toDF("g", "b")
    val got = Temporal.holtWintersDyadic(ev, "g", col("b"), period = 2, lags = 3)
      .orderBy("b")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect().toSeq
    got.foreach { case (_, b, x, sq, level, trend, forecast) =>
      assert(x == (if (b % 2 == 0) 3L else 7L))
      assert(sq == (if (b % 2 == 0) 3000000L else 7000000L))
      assert(level == 0.0 && trend == 0.0, s"b=$b: residual must vanish")
      assert(forecast == (if (b % 2 == 0) 3.0 else 7.0), s"b=$b got $forecast")
    }
    // general series: replay the whole chain driver-side
    val xs = Seq(1L, 4L, 2L, 6L, 3L, 5L, 9L, 2L)
    val ev2 = xs.zipWithIndex.flatMap { case (n, b) =>
      Seq.fill(n.toInt)(("u", b.toLong)) }.toDF("g", "b")
    val got2 = Temporal.holtWintersDyadic(ev2, "g", col("b"), period = 2, lags = 3)
      .orderBy("b")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect().toSeq
    val phSum = Array(0L, 1L).map(p => xs.indices.filter(_ % 2 == p.toInt).map(xs(_)).sum)
    val phN = Array(0L, 1L).map(p => xs.indices.count(_ % 2 == p.toInt).toLong)
    val sq = Array(0, 1).map { p =>
      val num = 2L * 1000000L * phSum(p) + phN(p)
      (num - num % (2 * phN(p))) / (2 * phN(p))
    }
    val d = xs.zipWithIndex.map { case (x, b) => x * 1000000L - sq(b % 2) }
    def kern(v: Seq[Long]): Seq[Long] = v.indices.map { t =>
      (0 until 3).map(k => (if (t - k >= 0) v(t - k) else 0L) * (1L << (2 - k))).sum
    }
    val s1 = kern(d); val s2 = kern(s1)
    val scale = (1L << 6) * 1000000.0
    got2.zipWithIndex.foreach { case ((_, b, x, gsq, level, trend, forecast), i) =>
      assert(x == xs(i) && gsq == sq(i % 2))
      assert(level == (s1(i) * 16 - s2(i)) / scale, s"level b=$b")
      assert(trend == (s1(i) * 8 - s2(i)) / scale, s"trend b=$b")
      assert(forecast == (s1(i) * 24 - 2 * s2(i) + sq(i % 2) * 64) / scale,
        s"forecast b=$b")
    }
  }

  test("ts_crosscorr: hand-computed anticorrelated pair; lag pairs B's previous bucket (round 9)") {
    // a counts [1,2,3], b counts [3,2,1] on buckets 0..2: ya = [−3,0,3],
    // yb = [3,0,−3]; cxy0 = −18, caa = cbb = 18 → rho0 = −1;
    // cxy1 = ya₁·yb₀ + ya₂·yb₁ = 0 → rho1 = 0
    val ev = (Seq.fill(1)(("a", 0L)) ++ Seq.fill(2)(("a", 1L)) ++
        Seq.fill(3)(("a", 2L)) ++ Seq.fill(3)(("b", 0L)) ++
        Seq.fill(2)(("b", 1L)) ++ Seq.fill(1)(("b", 2L))).toDF("ty", "b")
    val got = Temporal.crosscorrScaled(ev)
      .as[(String, String, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(got === Seq(("a", "b", -18L, 0L, 18L, 18L, -1.0, 0.0)),
      got.toString)
  }

  test("rollup_incremental: merged partials ≡ full recompute; three-way merge associative (round 9)") {
    import graft.operators.Rollup
    val facts = Seq(
      (1L, 10L, 5L), (1L, 20L, 7L), (1L, 30L, 2L),
      (2L, 15L, 9L)
    ).toDF("k", "m", "o")
    // hand check on the full frame: k=1 → (3, 60, 2, 7); k=2 → (1, 15, 9, 9)
    val full = Rollup.partials(facts, Seq("k"), col("m"), col("o"))
      .orderBy("k").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(full === Seq((1L, 3L, 60L, 2L, 7L), (2L, 1L, 15L, 9L, 9L)),
      full.toString)
    // split any which way, merge ≡ full — incl. a key absent from a batch
    val a = Rollup.partials(facts.filter(col("o") < 5), Seq("k"), col("m"), col("o"))
    val b = Rollup.partials(facts.filter(col("o") >= 5 && col("o") < 8), Seq("k"), col("m"), col("o"))
    val c = Rollup.partials(facts.filter(col("o") >= 8), Seq("k"), col("m"), col("o"))
    val merged = Rollup.merge(Seq("k"), a, b, c)
      .orderBy("k").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(merged === full, merged.toString)
    // merging in a different order is identical (associativity)
    val merged2 = Rollup.merge(Seq("k"), Rollup.merge(Seq("k"), c, a), b)
      .orderBy("k").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(merged2 === full, merged2.toString)
  }

  test("vec_knn_classify: majority vote recomputed driver-side from the gated kNN graph (round 9)") {
    val out = QueriesAnalytics.all("vec_knn_classify")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val emb = Tables.embeddings(spark, sf)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val knn = graft.operators.Similarity.knnGraphExact(emb, 5)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = knn.groupBy(_._1).map { case (src, es) =>
      val counts = es.map(e => labels(e._2))
        .groupBy(identity).map { case (l, xs) => (l, xs.size.toLong) }
      val (pl, pc) = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head
      src -> ((labels(src), pl, pc))
    }
    assert(expect.size === out.size)
    expect.foreach { case (src, e) => assert(out(src) === e, s"vec $src") }
  }

  test("dq_drift_ks: hand ECDF max, tie to smallest value; bucket-boundary-proof (round 9)") {
    import graft.operators.Drift
    // ref [1,2,3] vs cur [2,3,4]: n1=n2=3; 3·F1−3·F2 over v=1..4 is
    // 3,3,3,0 → D_scaled=3 at v=1 (tie → smallest); ks = 1/3 r8-floored
    val df = (Seq(1.0, 2.0, 3.0).map((_, true)) ++
        Seq(2.0, 3.0, 4.0).map((_, false))).toDF("v", "ref")
    val got = Drift.ksScaled(df, col("v"), col("ref"))
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq((3L, 3L, 3L, 1.0, 0.33333333)), got.toString)
    // identical result when values straddle bucket boundaries
    val wide = (Seq(1.0, 2.0, 3.0).map(x => (x * 9999, true)) ++
        Seq(2.0, 3.0, 4.0).map(x => (x * 9999, false))).toDF("v", "ref")
    val g2 = Drift.ksScaled(wide, col("v"), col("ref"))
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(g2 === Seq((3L, 3L, 3L, 9999.0, 0.33333333)), g2.toString)
  }

  test("agg_moments: power-sum chain matches a driver replay; symmetric data skew 0") {
    val out = QueriesCore.all("agg_moments")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(out.nonEmpty)
    val qty = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"))
      .as[(String, Double)].collect().groupBy(_._1)
    out.foreach { case (flag, n, s1, s2, s3, s4, skew, kurt) =>
      val xs = qty(flag).map(_._2.toLong)
      assert(n === xs.length.toLong && s1 === xs.sum)
      assert(s2 === xs.map(x => x * x).sum && s4 === xs.map(x => x * x * x * x).sum)
      val (nd, mu) = (n.toDouble, s1.toDouble / n.toDouble)
      val m2 = s2.toDouble / nd - mu * mu
      val m3 = s3.toDouble / nd - 3.0 * mu * (s2.toDouble / nd) + 2.0 * mu * mu * mu
      val m4 = s4.toDouble / nd - 4.0 * mu * (s3.toDouble / nd) +
        6.0 * mu * mu * (s2.toDouble / nd) - 3.0 * mu * mu * mu * mu
      assert(skew === math.floor(m3 / math.sqrt(m2 * m2 * m2) * 1e4 + 0.5) / 1e4)
      assert(kurt === math.floor((m4 / (m2 * m2) - 3.0) * 1e4 + 0.5) / 1e4)
      // l_quantity is ~uniform on [1,50]: near-zero skew, platykurtic
      assert(math.abs(skew) < 0.2 && kurt < 0.0, s"$flag skew $skew kurt $kurt")
    }
  }

  test("fn_geo: haversine matches a driver replay; same-point distance is 0") {
    val out = QueriesCore.all("fn_geo")(spark, sf)
      .as[(Long, Double, Double, Double, Double, Double)].collect().toSeq
    assert(out.nonEmpty)
    val rad = 0.017453292519943295
    out.foreach { case (_, la, lo, lb, lx, d) =>
      val sp = math.sin((lb - la) * rad / 2.0); val sl = math.sin((lx - lo) * rad / 2.0)
      val h = sp * sp + math.cos(la * rad) * math.cos(lb * rad) * (sl * sl)
      val want = math.floor(12742.0 * math.asin(math.sqrt(h)) * 1e4 + 0.5) / 1e4
      assert(d === want)
      assert(d >= 0.0 && d <= 20015.1)
      if (la == lb && lo == lx) assert(d === 0.0)
    }
  }

  test("periodogram: planted daily sinusoid concentrates power at k=1; brute-force sums") {
    import graft.operators.Temporal
    // two days of hourly counts x(p) = 10 + round(5 cos(2π p/24))
    def amp(p: Int) = 10 + math.round(5 * math.cos(2 * math.Pi * p / 24)).toInt
    val rows = for (d <- 0 to 1; p <- 0 until 24; _ <- 1 to amp(p))
      yield ("a", (d * 24 + p).toLong)
    val df = rows.toDF("g", "b")
    val out = Temporal.periodogram(df, col("g"), col("b"))
      .as[(String, Int, Long, Long, Double)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    // brute-force replay on the same integer trig tables
    val trig = Temporal.trigMicro(24, 3)
      .map { case (k, p, c, s) => (k, p) -> ((c, s)) }.toMap
    val x = (0L to 47L).map(b => b -> amp((b % 24).toInt).toLong).toMap
    for (k <- 1 to 3) {
      val sc = x.map { case (b, n) => n * trig((k, b % 24))._1 }.sum
      val ss = x.map { case (b, n) => n * trig((k, b % 24))._2 }.sum
      val power = math.floor((sc.toDouble * sc + ss.toDouble * ss)
        / 1e8 * 1e8 + 0.5) / 1e8
      assert(out(k) === ((sc, ss, power)), s"harmonic $k")
    }
    // the planted frequency dominates its harmonics by orders of magnitude
    assert(out(1)._3 > 100 * out(2)._3 && out(1)._3 > 100 * out(3)._3)
  }

  test("sketch_cms_counts: exact regime — estimates equal true counts, repeatably") {
    val a = QueriesLLM.all("sketch_cms_counts")(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(a.nonEmpty && a.forall { case (_, exact, est) => est === exact })
    val b = QueriesLLM.all("sketch_cms_counts")(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(a === b) // seeded sketch: deterministic under re-run
  }

  test("scd2ApplyDelta: hand case covers merge/close/new-key; fixture ≡ full rebuild") {
    import graft.operators.Temporal
    // base: user 1 A(1) A(2) B(3); user 3 Z(1) — user 3 untouched by delta
    val base = Seq((1L, 1L, 1L, "A"), (1L, 2L, 2L, "A"), (1L, 3L, 3L, "B"),
      (3L, 1L, 4L, "Z")).toDF("k", "ts", "tie", "v")
    // delta: user 1 B(10) C(11) (B merges into the open run); user 2 is new
    val delta = Seq((1L, 10L, 5L, "B"), (1L, 11L, 6L, "C"), (2L, 5L, 7L, "X"))
      .toDF("k", "ts", "tie", "v")
    val baseIv = Temporal.scd2(base, "k", col("ts"), col("tie"), col("v"))
    val got = Temporal.scd2ApplyDelta(baseIv, delta, "k",
        col("ts"), col("tie"), col("v"))
      .orderBy("k", "run")
      .as[(Long, Long, String, Long, Long, Option[Long])].collect().toSeq
    assert(got === Seq(
      (1L, 1L, "A", 1L, 2L, Some(3L)),
      (1L, 2L, "B", 3L, 2L, Some(11L)), // base B(3) + delta B(10) merged
      (1L, 3L, "C", 11L, 1L, None),
      (2L, 1L, "X", 5L, 1L, None),
      (3L, 1L, "Z", 1L, 1L, None)))
    // full-rebuild identity
    val full = Temporal.scd2(base.unionByName(delta), "k",
        col("ts"), col("tie"), col("v"))
      .select(col("k"), col("run"), col("attr"), col("eff_from"),
        col("n_rows"), col("eff_to"))
      .orderBy("k", "run")
      .as[(Long, Long, String, Long, Long, Option[Long])].collect().toSeq
    assert(got === full)
  }

  test("scd2ApplyDelta enforces its contract: negative tie and at-or-before-open delta both fail (ADVICE r9)") {
    import graft.operators.Temporal
    val base = Seq((1L, 1L, 1L, "A"), (1L, 3L, 2L, "B")).toDF("k", "ts", "tie", "v")
    val baseIv = Temporal.scd2(base, "k", col("ts"), col("tie"), col("v"))
    // a negative tie would collide with the synthetic open-run seed (-1)
    val badTie = Seq((1L, 10L, -5L, "C")).toDF("k", "ts", "tie", "v")
    val e1 = intercept[IllegalArgumentException] {
      Temporal.scd2ApplyDelta(baseIv, badTie, "k", col("ts"), col("tie"), col("v"))
    }
    assert(e1.getMessage.contains("non-negative"))
    // a delta at/before the open run's eff_from (3) belongs to history
    val badTs = Seq((1L, 3L, 5L, "C")).toDF("k", "ts", "tie", "v")
    val e2 = intercept[IllegalArgumentException] {
      Temporal.scd2ApplyDelta(baseIv, badTs, "k", col("ts"), col("tie"), col("v"))
    }
    assert(e2.getMessage.contains("strictly later"))
    // in-contract deltas still pass untouched
    val ok = Seq((1L, 10L, 5L, "C")).toDF("k", "ts", "tie", "v")
    assert(Temporal.scd2ApplyDelta(baseIv, ok, "k",
      col("ts"), col("tie"), col("v")).count() == 3)
  }

  test("rollingSlope rebase: epoch-second-scale bucket indices no longer overflow the frame sums (ADVICE r9)") {
    import graft.operators.Temporal
    // raw b ≈ 1.7e9: sum(b*b) over an 8-frame would be ~2.3e19 > Long.Max
    // without the per-key rebase; with it, x ∈ [0, span) and the perfect
    // line still reads slope exactly 1
    val b0 = 1700000000L
    val df = (0 to 6).flatMap(i => Seq.fill(i + 1)((1L, b0 + i))).toDF("k", "b")
    val out = Temporal.rollingSlope(df, "k", col("b"))
      .select("b", "slope").as[(Long, Double)].collect().toMap
    (1 to 6).foreach(i => assert(out(b0 + i) === 1.0, s"b offset $i"))
    assert(out(b0) === 0.0)
  }

  test("rollingSlope: perfect line slope 1; flat 0; head frame degenerate") {
    import graft.operators.Temporal
    // user 1 counts per bucket 0..4 = [1,2,3,4,5]: every >=2-point
    // trailing frame of a perfect line has slope exactly 1
    def rows(k: Long, b: Long, n: Int) = Seq.fill(n)((k, b))
    val df = ((0 to 4).flatMap(b => rows(1L, b.toLong, b + 1)) ++
      rows(2L, 0L, 2) ++ rows(2L, 1L, 2) ++ rows(2L, 2L, 2)).toDF("k", "b")
    val out = Temporal.rollingSlope(df, "k", col("b"))
      .select("k", "b", "slope").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 0L)) === 0.0) // n=1, den=0
    (1 to 4).foreach(b => assert(out((1L, b.toLong)) === 1.0, s"b$b"))
    (1 to 2).foreach(b => assert(out((2L, b.toLong)) === 0.0, s"flat b$b"))
  }

  test("streaks: islands split exactly at gaps; singleton and duplicate buckets") {
    import graft.operators.Temporal
    // user 1 active buckets {0,1,2, 5,6, 9} -> 6 active, 3 streaks, max 3
    // (bucket 1 appears twice: distinct first). user 2: {4} -> 1/1/1.
    val df = Seq((1L, 0L), (1L, 1L), (1L, 1L), (1L, 2L), (1L, 5L), (1L, 6L),
      (1L, 9L), (2L, 4L)).toDF("k", "b")
    val out = Temporal.streaks(df, "k", col("b"))
      .orderBy("k").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 6L, 3L, 3L), (2L, 1L, 1L, 1L)))
  }

  test("ivfAdcTopK: equals the full ADC ranking restricted to the query's cell") {
    import graft.operators.{Clustering, Pq}
    val emb = Tables.embeddings(spark, sf)
    val ivf = Pq.ivfAdcTopK(emb, queryId = 0L, dims = 64, subspaces = 8,
        k = 4, rounds = 2, coarseK = 4, coarseRounds = 2, topK = 10)
      .as[(Long, Long)].collect().toSeq
    // composition identity: coarse assignment (gated kernel) + full ADC
    val cellOf = Clustering.kmeansAssign(emb, k = 4, rounds = 2)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val qCell = cellOf(0L)
    val full = Pq.adcTopK(emb, queryId = 0L, dims = 64, subspaces = 8,
        k = 4, rounds = 2, topK = Int.MaxValue)
      .as[(Long, Long)].collect().toSeq
    val expected = full.filter { case (id, _) => cellOf(id) == qCell }.take(10)
    assert(ivf === expected)
    assert(ivf.nonEmpty && ivf.head._1 === 0L) // the query lives in its own cell
  }

  test("madOutliers: spike flagged where z-score masking would hide it; zero-MAD regime") {
    import graft.operators.Temporal
    // user 1 counts: [1,1,1,2,1,1,1,50,1] -> med 1, devs {0x6,1,49} ->
    // MAD 0 (zero-MAD regime): flagged = every x != med -> b3 (x=2), b7 (x=50)
    def rows(k: Long, b: Long, n: Int) = Seq.fill(n)((k, b))
    val df = (rows(1L, 0L, 1) ++ rows(1L, 1L, 1) ++ rows(1L, 2L, 1) ++
      rows(1L, 3L, 2) ++ rows(1L, 4L, 1) ++ rows(1L, 5L, 1) ++ rows(1L, 6L, 1) ++
      rows(1L, 7L, 50) ++ rows(1L, 8L, 1) ++
      // user 2: [2,4,2,4,100] -> med 4 (3rd of {2,2,4,4,100});
      // devs {2,0,2,0,96} sorted {0,0,2,2,96} -> MAD 2;
      // flagged iff dev > 6: only the 100-spike
      rows(2L, 0L, 2) ++ rows(2L, 1L, 4) ++ rows(2L, 2L, 2) ++
      rows(2L, 3L, 4) ++ rows(2L, 4L, 100)).toDF("k", "b")
    val out = Temporal.madOutliers(df, "k", col("b"))
      .orderBy("k", "b")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 2L, 1L, 0L, 1L),
      (1L, 7L, 50L, 1L, 0L, 49L),
      (2L, 4L, 100L, 4L, 2L, 96L)), out.toString)
  }

  test("adcTopK: matches a driver-side ADC replay; slices and 1-based codes aligned") {
    import graft.operators.{Clustering, Pq}
    val vecs = Seq(
      (0L, Array(0f, 0f, 10f, 10f)),
      (1L, Array(0.1f, -0.1f, 9f, 11f)),
      (2L, Array(5f, 5f, 0f, 0f)),
      (3L, Array(5.2f, 4.8f, 0.5f, -0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Pq.adcTopK(df, queryId = 0L, dims = 4, subspaces = 2,
        k = 2, rounds = 1, topK = 4)
      .as[(Long, Long)].collect().toSeq
    // driver-side replay on the same trained codebooks
    def quant(x: Float) = math.floor(x.toDouble * 1e6 + 0.5).toLong
    val cbs = (0 until 2).map { s =>
      Clustering.trainCentroids(
        df.select(col("vec_id"),
          slice(col("embedding"), s * 2 + 1, 2).as("embedding")), 2, 1)
    }
    def subD2(v: Array[Long], cent: Array[Long]): Long =
      v.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
    def code(v: Array[Long], s: Int): Int =
      cbs(s).zipWithIndex
        .map { case (c, i) => (subD2(v.slice(s * 2, s * 2 + 2), c), i + 1) }
        .min._2
    val q = vecs.find(_._1 == 0L).get._2.map(quant)
    val expected = vecs.map { case (id, emb) =>
      val v = emb.map(quant)
      id -> (0 until 2).map { s =>
        subD2(q.slice(s * 2, s * 2 + 2), cbs(s)(code(v, s) - 1))
      }.sum
    }.sortBy { case (id, adc) => (adc, id) }
    assert(out === expected, s"got $out expected $expected")
    // the query's own adc is minimal here (it IS a seed centroid's mate)
    assert(out.head._1 === 0L)
  }

  test("rollingMedian: spike-proof hand frames; gap counts 0; even frame averages") {
    import graft.operators.Temporal
    // user 1 counts per bucket: [1,1,10,1,1,0(gap),2]; the 10-spike
    // never moves the median. user 2: [1,2] -> both frames median 1.5.
    def rows(k: Long, b: Long, n: Int) = Seq.fill(n)((k, b))
    val df = (rows(1L, 0L, 1) ++ rows(1L, 1L, 1) ++ rows(1L, 2L, 10) ++
      rows(1L, 3L, 1) ++ rows(1L, 4L, 1) ++ rows(1L, 6L, 2) ++
      rows(2L, 0L, 1) ++ rows(2L, 1L, 2)).toDF("k", "b")
    val out = Temporal.rollingMedian(df, "k", col("b"))
      .orderBy("k", "b")
      .as[(Long, Long, Long, Double, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 1L, 1.0, 1L, 10L, 3L),
      (1L, 1L, 1L, 1.0, 1L, 10L, 4L),
      (1L, 2L, 10L, 1.0, 1L, 10L, 5L),
      (1L, 3L, 1L, 1.0, 0L, 10L, 5L),
      (1L, 4L, 1L, 1.0, 0L, 10L, 5L),
      (1L, 5L, 0L, 1.0, 0L, 2L, 4L),
      (1L, 6L, 2L, 1.0, 0L, 2L, 3L),
      (2L, 0L, 1L, 1.5, 1L, 2L, 2L),
      (2L, 1L, 2L, 1.5, 1L, 2L, 2L)), out.toString)
  }

  test("dq_benford: digit from cents rendering (999.995 edge); spine coalesces; dev arithmetic") {
    import graft.operators.Drift
    // 1.0 -> 100c digit 1; 25.5 -> 2550c digit 2; 0.005 -> 1c digit 1;
    // 999.995 -> 100000c digit 1 (the libm-log10 flip case done right);
    // 0.0 / -3.0 / NULL drop. N=4: digits 1 x3, 2 x1, rest 0.
    val df = Seq(Some(1.0), Some(25.5), Some(0.005), Some(999.995),
      Some(0.0), Some(-3.0), None).toDF("v")
    val out = Drift.benfordScaled(df, col("v"))
      .orderBy("digit").collect()
    assert(out.length === 9)
    val byDigit = out.map(r => r.getInt(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val p1 = Drift.benfordMicro(1)
    assert(byDigit(1) === ((3L, p1, 4L * p1, 3L * 100000000L - 4L * p1)))
    val p2 = Drift.benfordMicro(2)
    assert(byDigit(2) === ((1L, p2, 4L * p2, 100000000L - 4L * p2)))
    (3 to 9).foreach { d =>
      val pd = Drift.benfordMicro(d)
      assert(byDigit(d) === ((0L, pd, 4L * pd, -4L * pd)), s"digit $d")
    }
    // chi_term is the r8-gridded dev^2/(e*1e8) of the integer fields
    out.foreach { r =>
      val (e, dev, chi) = (r.getLong(3), r.getLong(4), r.getDouble(5))
      val want = math.floor(dev.toDouble * dev.toDouble
        / (e.toDouble * 1e8) * 1e8 + 0.5) / 1e8
      assert(chi === want, s"digit ${r.getInt(0)}")
    }
  }

  test("curate_semdedup: drop rule recomputed driver-side; drops non-vacuous (round 9)") {
    import graft.operators.Clustering
    val out = QueriesAnalytics.all("curate_semdedup")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Number](1).longValue, r.getBoolean(2)))).toMap
    val emb = Tables.embeddings(spark, sf)
    val asn = Clustering.kmeansAssign(emb, k = 4, rounds = 2)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      math.floor(r * 10000 + 0.5) / 10000 // the r4 grid the query thresholds on
    }
    val byCluster = asn.groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1).toSeq.sorted }
    val expectDropped = byCluster.values.flatMap { ids =>
      ids.filter(v => ids.exists(u => u < v && cos(vecs(u), vecs(v)) >= 0.35))
    }.toSet
    assert(expectDropped.nonEmpty, "tau vacuous on the fixture")
    out.foreach { case (id, (cl, dropped)) =>
      assert(cl === asn(id), s"vec $id cluster")
      assert(dropped === expectDropped(id), s"vec $id dropped")
    }
    assert(out.keySet === asn.keySet)
  }

  test("eval_ann_recall: bounds, consistency, and the recall law on the fixture (round 9)") {
    val Seq((nq, nt, nh, rec)) = QueriesAnalytics.all("eval_ann_recall")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(nt === nq * 5, "k=5 truth rows per query")
    assert(nh >= 0 && nh <= nt)
    assert(math.abs(rec - math.floor(nh.toDouble / nt * 1e8 + 0.5) / 1e8) < 1e-12)
    // cluster-restricted candidates can't be perfect on this geometry
    // but must beat the ~1/4 random-cell floor (4 clusters)
    assert(rec > 0.25 && rec < 1.0, s"recall $rec")
  }

  test("registered analytics queries return rows at sf0.001") {
    for ((name, q) <- QueriesAnalytics.all) {
      val n = q(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}

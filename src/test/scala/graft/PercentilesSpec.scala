package graft

import org.apache.spark.sql.functions._
import graft.operators.Percentiles

class PercentilesSpec extends SparkTestBase {
  import spark.implicits._

  test("exactDiscrete matches PERCENTILE_DISC semantics on crafted boundaries") {
    // n=4: p=.5 -> 2nd value, p=.25 -> 1st, p=.75 -> 3rd, p=.95 -> 4th
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0)).toDF("k", "v")
    val out = Percentiles.exactDiscrete(df, "v", Seq("k"),
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95)).head()
    assert((out.getDouble(1), out.getDouble(2), out.getDouble(3), out.getDouble(4))
      == ((1.0, 2.0, 3.0, 4.0)))
  }

  test("exactDiscrete picks an actual input value, never interpolates") {
    val df = Seq.tabulate(101)(i => ("g", (i * 3).toDouble)).toDF("k", "v")
    val out = Percentiles.exactDiscrete(df, "v", Seq("k"), Seq("p37" -> 0.37)).head()
    val v = out.getDouble(1)
    assert(v % 3 == 0.0 && v >= 0 && v <= 300)
  }

  test("exactDiscrete agrees with Spark's buffering percentile on the fixture") {
    // percentile(v, p) interpolates; on a discrete column compare against
    // the rank-based definition via sort+index instead: value at
    // ceil(p*n) (1-based) of the sorted sequence
    val li = Tables.lineitem(spark, sf).select(col("l_returnflag").as("k"),
      col("l_quantity").as("v"))
    val got = Percentiles.exactDiscrete(li, "v", Seq("k"),
      Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val truth = li.collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) =>
        val sorted = vs.map(_._2).sorted
        def pick(p: Double) = sorted(math.ceil(p * sorted.length).toInt - 1)
        k -> ((pick(0.25), pick(0.5), pick(0.95)))
      }
    assert(got == truth)
  }

  test("exactContinuous is bit-identical to Spark's buffering percentile") {
    val li = Tables.lineitem(spark, sf).select(col("l_returnflag").as("k"),
      col("l_quantity").as("v"))
    val got = Percentiles.exactContinuous(li, "v", Seq("k"),
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val want = li.groupBy("k")
      .agg(expr("percentile(v, array(0.25, 0.5, 0.75, 0.95))").as("q"))
      .collect().map(r => r.getString(0) -> {
        val q = r.getSeq[Double](1); (q(0), q(1), q(2), q(3)) }).toMap
    assert(got == want)
  }

  test("exactContinuous interpolates between adjacent values") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0)).toDF("k", "v")
    // pos = .5*(4-1) = 1.5 -> between sorted[1]=2 and sorted[2]=3 -> 2.5
    val out = Percentiles.exactContinuous(df, "v", Seq("k"), Seq("p50" -> 0.5)).head()
    assert(out.getDouble(1) == 2.5)
  }

  test("exactContinuousSorted and exactContinuousMulti agree with exactContinuous") {
    val li = Tables.lineitem(spark, sf).select(col("l_returnflag").as("k"),
      col("l_quantity").as("q"), col("l_extendedprice").as("p"))
    val probsQ = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)
    val base = Percentiles.exactContinuous(li, "p", Seq("k"), Seq("p95" -> 0.95))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sorted = Percentiles.exactContinuousSorted(li, "p", Seq("k"), Seq("p95" -> 0.95))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sorted == base) // bit-identical picks under ties
    val baseQ = Percentiles.exactContinuous(li, "q", Seq("k"), probsQ)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // multi: both columns fused; bucket width must not affect results
    for (widths <- Seq((1.0, 2000.0), (7.0, 123.0))) {
      val multi = Percentiles.exactContinuousMulti(li, Seq("k"),
        Seq(("q", widths._1, probsQ), ("p", widths._2, Seq("p95" -> 0.95))))
        .collect().map(r => r.getString(0) ->
          ((r.getDouble(1), r.getDouble(2), r.getDouble(3)), r.getDouble(4))).toMap
      assert(multi.view.mapValues(_._1).toMap == baseQ, s"qty mismatch at $widths")
      assert(multi.view.mapValues(_._2).toMap == base, s"price mismatch at $widths")
    }
  }

  test("exactContinuousMulti handles negative values and tied runs across buckets") {
    val df = (Seq.fill(40)(-3.0) ++ Seq.fill(40)(2.0) ++ Seq(-10.0, 11.0))
      .map(("g", _)).toDF("k", "v")
    val base = Percentiles.exactContinuous(df, "v", Seq("k"),
      Seq("p10" -> 0.1, "p50" -> 0.5, "p90" -> 0.9))
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3))).head
    val multi = Percentiles.exactContinuousMulti(df, Seq("k"),
      Seq(("v", 2.5, Seq("p10" -> 0.1, "p50" -> 0.5, "p90" -> 0.9))))
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3))).head
    assert(multi == base)
  }

  test("exactContinuousMulti degenerate groups: n=1, all-equal, one-bucket-wide") {
    // n=1 (pos=0, lo==hi rank 1), an all-equal group (every rank in one
    // bucket), and a width so wide the whole group is a single bucket
    // (refinement degenerates to sorting the group — still correct)
    val df = (Seq(("solo", 7.5)) ++ Seq.fill(9)(("same", 4.0)) ++
      (1 to 10).map(i => ("wide", i.toDouble))).toDF("k", "v")
    for (width <- Seq(0.5, 1e6)) {
      val got = Percentiles.exactContinuousMulti(df, Seq("k"),
        Seq(("v", width, Seq("p25" -> 0.25, "p50" -> 0.5))))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(got("solo") == ((7.5, 7.5)), s"width=$width")
      assert(got("same") == ((4.0, 4.0)), s"width=$width")
      // wide: pos25 = .25*9 = 2.25 -> 3.0 + .25*(4-3) = 3.25; pos50 = 4.5 -> 5.5
      assert(got("wide") == ((3.25, 5.5)), s"width=$width")
    }
  }

  test("all forms ignore NULL values, matching Spark's percentile") {
    val df = Seq(("g", Some(1.0)), ("g", None), ("g", Some(2.0)), ("g", None),
      ("g", Some(3.0)), ("g", Some(4.0))).toDF("k", "v")
    val want = df.groupBy("k").agg(expr("percentile(v, 0.5)")).head.getDouble(1)
    assert(want == 2.5) // sanity: nulls excluded from n
    assert(Percentiles.exactContinuous(df, "v", Seq("k"), Seq("p50" -> 0.5))
      .head.getDouble(1) == want)
    assert(Percentiles.exactContinuousSorted(df, "v", Seq("k"), Seq("p50" -> 0.5))
      .head.getDouble(1) == want)
    assert(Percentiles.exactContinuousMulti(df, Seq("k"),
      Seq(("v", 1.0, Seq("p50" -> 0.5)))).head.getDouble(1) == want)
    // discrete: smallest value whose cumulative count reaches ceil(.5*4)=2
    assert(Percentiles.exactDiscrete(df, "v", Seq("k"), Seq("p50" -> 0.5))
      .head.getDouble(1) == 2.0)
  }

  test("exactDiscrete handles multiple groups and ungrouped (global) form") {
    val df = Seq(("a", 1.0), ("a", 9.0), ("b", 5.0)).toDF("k", "v")
    val grouped = Percentiles.exactDiscrete(df, "v", Seq("k"), Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(grouped == Map("a" -> 1.0, "b" -> 5.0))
    val global = Percentiles.exactDiscrete(df, "v", Nil, Seq("p50" -> 0.5)).head()
    assert(global.getDouble(0) == 5.0)
  }

  test("weightedQuantile: cumulative-weight rule, hand-computed") {
    // group a: (v=1,w=1), (v=2,w=3), (v=10,w=1) — W=5
    //   median: smallest v with 2*cum >= 5 -> cum(2)=4, 8>=5 -> 2
    //   p90 (9/10): smallest v with 10*cum >= 45 -> v=10 (cum 5)
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 3L), ("a", 10.0, 1L),
      ("b", 7.0, 2L)).toDF("k", "v", "w")
    val out = Percentiles.weightedQuantile(df, "v", "w", Seq("k"),
        Seq(("wmedian", 1, 2), ("wp90", 9, 10)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out == Map("a" -> (2.0, 10.0), "b" -> (7.0, 7.0)))
  }

  test("weightedQuantile: unit weights reduce to the discrete percentile; w<=0 rows ignored") {
    // weight-0 row would shift the median if counted (4.0 enters the tail)
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 1L), ("a", 4.0, 0L))
      .toDF("k", "v", "w")
    val out = Percentiles.weightedQuantile(df, "v", "w", Seq("k"),
      Seq(("p50", 1, 2))).head()
    val disc = Percentiles.exactDiscrete(df.filter(col("w") > 0), "v", Seq("k"),
      Seq("p50" -> 0.5)).head()
    assert(out.getDouble(1) == disc.getDouble(1) && out.getDouble(1) == 2.0)
  }

  test("agg_winsorized_mean: clamp caps the outlier's pull; plain mean unaffected inside cuts") {
    val out = graft.QueriesCore.all("agg_winsorized_mean")(
        spark, "/root/testdata/sf0.001")
      .as[(String, Long, Double, Double, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    // driver replay: exact discrete cuts + clamp + integer mean
    val qty = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_returnflag"), col("l_quantity"))
      .as[(String, Double)].collect().groupBy(_._1)
    out.foreach { case (flag, n, p05, p95, sumW, wmean) =>
      val xs = qty(flag).map(_._2).sorted
      def disc(p: Double) = xs(math.ceil(p * xs.length).toInt - 1)
      assert((p05, p95) === ((disc(0.05), disc(0.95))), s"$flag cuts")
      val ws = xs.map(x => math.max(p05, math.min(p95, x)).toLong)
      assert((n, sumW) === ((xs.length.toLong, ws.sum)), s"$flag sums")
      assert(wmean ===
        math.floor(ws.sum.toDouble / xs.length * 1e8 + 0.5) / 1e8, s"$flag mean")
    }
  }

  test("medianAbsDev: hand values; outlier-proof where stddev is not; NULLs ignored") {
    // group a: {1,2,3,4,100} -> med 3 (ceil(0.5*5)=3rd), devs {2,1,0,1,97}
    //   sorted {0,1,1,2,97} -> mad 1: the outlier moved MAD not at all
    // group b: {5,5} -> med 5, devs {0,0} -> mad 0
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
      ("b", 5.0), ("b", 5.0)).toDF("k", "v")
    val out = Percentiles.medianAbsDev(df, "v", Seq("k"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out === Map("a" -> ((3.0, 1.0)), "b" -> ((5.0, 0.0))))
    // NULL values drop before both passes: same answer without the null row
    val withNull = df.unionAll(Seq(("a", Option.empty[Double])).toDF("k", "v"))
    val out2 = Percentiles.medianAbsDev(withNull, "v", Seq("k"))
      .filter(col("k") === "a").head()
    assert((out2.getDouble(1), out2.getDouble(2)) === ((3.0, 1.0)))
  }
}

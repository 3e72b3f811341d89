package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  test("hash sample hits the target fraction within tolerance") {
    val n = docs.count().toDouble
    val k = Sampling.hashSample(docs, col("doc_id"), 0.1).count().toDouble
    assert(math.abs(k / n - 0.1) < 0.04, s"got ${k / n}")
  }

  test("sample is independent of partitioning and repeatable") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(17, col("lang")), col("doc_id"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("nested samples: 10% is a subset of 20% (same salt)") {
    val s10 = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s20 = Sampling.hashSample(docs, col("doc_id"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s20))
  }

  test("split assignment covers every row exactly once with ~80/10/10 mass") {
    val n = docs.count().toDouble
    val splits = docs.select(Sampling.splitColumn(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits.values.sum == n)
    assert(math.abs(splits("train") / n - 0.8) < 0.05, splits.toString)
    assert(math.abs(splits("val") / n - 0.1) < 0.04, splits.toString)
  }

  test("split is consistent across tables sharing the key") {
    // the same doc_id must land in the same split when assigned from a
    // different table (embeddings.vec_id joins documents.doc_id)
    val fromDocs = docs.select(col("doc_id"),
      Sampling.splitColumn(col("doc_id"), Seq("train" -> 0.8, "val" -> 0.2)).as("s1"))
    val fromEmb = Tables.embeddings(spark, sf).select(col("vec_id").as("doc_id"),
      Sampling.splitColumn(col("vec_id"), Seq("train" -> 0.8, "val" -> 0.2)).as("s2"))
    val mismatched = fromDocs.join(fromEmb, "doc_id").filter(col("s1") =!= col("s2"))
    assert(mismatched.isEmpty)
  }

  test("stratified sample keeps each stratum near the fraction") {
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"), 0.2)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, total) <- perLang if total >= 50) {
      val f = sampled.getOrElse(lang, 0L).toDouble / total
      assert(math.abs(f - 0.2) < 0.12, s"$lang: $f of $total")
    }
  }

  test("sampling ops stay narrow: no shuffle in the filter") {
    val plan = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("temperature sampling flattens the head: small sources gain share") {
    // sources: 160 "big" rows, 10 "small" rows; α=0.5 boosts small's
    // share from 10/170 to sqrt(10)/(sqrt(160)+sqrt(10)) ≈ 0.2
    val rows = (1L to 160L).map(i => (i, "big")) ++ (201L to 210L).map(i => (i, "small"))
    val df = rows.toDF("id", "src")
    val out = Sampling.temperatureSample(df, col("id"), col("src"),
        alpha = 0.5, keepRatio = 0.5)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // targets: W = sqrt(160)+sqrt(10) ≈ 15.81; K = 85
    // big -> round(85*12.65/15.81) = 68, small -> min(10, round(85*3.16/15.81)) = 10
    assert(out === Map("big" -> 68L, "small" -> 10L))
  }

  test("temperature sampling with α=1 reproduces proportional targets") {
    val rows = (1L to 100L).map(i => (i, "a")) ++ (101L to 150L).map(i => (i, "b"))
    val out = Sampling.temperatureSample(rows.toDF("id", "src"), col("id"), col("src"),
        alpha = 1.0, keepRatio = 0.5)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 50L, "b" -> 25L)) // plain 50% of each
  }

  test("temperature sampling is deterministic and partition-independent") {
    val df = docs.select(col("doc_id"), col("source"))
    val a = Sampling.temperatureSample(df, col("doc_id"), col("source"), 0.5, 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(df.repartition(17, (col("doc_id") * 7) % 13),
        col("doc_id"), col("source"), 0.5, 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("temperatureSampleFast: counts near exact targets, deterministic, no rank window") {
    val df = docs.select(col("doc_id"), col("source"))
    // exact-form counts ARE the targets (asserted above); the threshold
    // form must land within binomial noise of them, per source
    val exact = Sampling.temperatureSample(df, col("doc_id"), col("source"), 0.5, 0.3)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fast = Sampling.temperatureSampleFast(df, col("doc_id"), col("source"), 0.5, 0.3)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, t) <- exact) {
      val got = fast.getOrElse(src, 0L)
      val tol = math.max(8.0, 4.0 * math.sqrt(t.toDouble))
      assert(math.abs(got - t) <= tol, s"source=$src fast=$got target=$t tol=$tol")
    }
    // partition-independence (the hash-threshold property)
    val again = Sampling.temperatureSampleFast(
        df.repartition(17, (col("doc_id") * 7) % 13),
        col("doc_id"), col("source"), 0.5, 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val first = Sampling.temperatureSampleFast(df, col("doc_id"), col("source"), 0.5, 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == first && first.nonEmpty)
    // keepRatio=1 keeps everything (t_s = n_s ⇒ threshold 2^48 > any u)
    val all = Sampling.temperatureSampleFast(df, col("doc_id"), col("source"), 0.5, 1.0)
    assert(all.count() == df.count())
    // the scale claim: no window/sort over the fact side in the plan
    val plan = Sampling.temperatureSampleFast(df, col("doc_id"), col("source"), 0.5, 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "threshold form must not rank the fact table")
  }

  test("weightedSample: w=1 keeps all, w=0 keeps none, rate tracks w, monotone superset") {
    val df = docs.select(col("doc_id"))
    val n = df.count()
    assert(Sampling.weightedSample(df, col("doc_id"), lit(1.0)).count() == n)
    assert(Sampling.weightedSample(df, col("doc_id"), lit(0.0)).count() == 0)
    // a constant weight degenerates to hashSample's coin: same coordinate,
    // binomial acceptance around w·n
    val half = Sampling.weightedSample(df, col("doc_id"), lit(0.5)).count()
    assert(math.abs(half - 0.5 * n) <= 4.0 * math.sqrt(0.25 * n) + 2,
      s"w=0.5 kept $half of $n")
    // pointwise-larger weights keep a SUPERSET (same u, higher cut)
    val lo = Sampling.weightedSample(df, col("doc_id"), lit(0.3))
      .collect().map(_.getLong(0)).toSet
    val hi = Sampling.weightedSample(df, col("doc_id"), lit(0.8))
      .collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi) && lo.nonEmpty && hi.size > lo.size)
    // partition-independence, and the plan stays a narrow filter
    val again = Sampling.weightedSample(
        df.repartition(17, (col("doc_id") * 7) % 13), col("doc_id"), lit(0.3))
      .collect().map(_.getLong(0)).toSet
    assert(again == lo)
    val plan = Sampling.weightedSample(df, col("doc_id"), lit(0.3))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"), plan)
  }

  test("tokenBudgetSample: budget honored to the nearest doc; under-budget sources kept whole; partition-independent") {
    val df = (1L to 60L).map(i => (i, if (i <= 40) "big" else "small", 10L))
      .toDF("doc_id", "source", "n_tokens")
    // big: 400 tokens available, budget 95 → keep docs until offset < 95:
    // offsets 0,10,…,90 → exactly 10 docs, total 100 (boundary doc kept).
    // small: 200 tokens available < no, 20 docs × 10 = 200 > 95 → also cut.
    val out = Sampling.tokenBudgetSample(df, col("doc_id"), col("source"),
        col("n_tokens"), budget = 95L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3)))
    val bySrc = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySrc == Map("big" -> 10, "small" -> 10),
      s"each source: offsets 0..90 survive the 95-token budget, got $bySrc")
    assert(out.forall(_._3 < 95L), "kept docs must START inside the budget")
    // a huge budget keeps every doc
    val all = Sampling.tokenBudgetSample(df, col("doc_id"), col("source"),
      col("n_tokens"), budget = 1000000L).count()
    assert(all == 60L)
    // deterministic under any input partitioning
    val again = Sampling.tokenBudgetSample(
        df.repartition(17, (col("doc_id") * 7) % 13), col("doc_id"),
        col("source"), col("n_tokens"), budget = 95L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3))).toSet
    assert(again == out.toSet)
    // the kept set follows the md5-shuffle order, not doc_id order
    val keptBig = out.filter(_._1 == "big").map(_._2).toSet
    assert(keptBig != (1L to 10L).toSet,
      "budget must cut in shuffle order, not id order")
  }

  test("hostCap: equals the naive per-host window; both paths live; partition-independent") {
    // crafted crawl shape: host "farm" holds 20 docs (over the cap),
    // hosts s1..s30 hold one each (under — the wholesale-pass path)
    val rows = (1L to 20L).map(i => (i, s"farm", 100L - i)) ++
      (21L to 50L).map(i => (i, s"s$i", i))
    val df = rows.toDF("id", "host", "q")
    val got = Sampling.hostCap(df, col("host"), Seq(col("q").desc, col("id").asc), k = 5)
      .select("id").as[Long].collect().toSet
    // naive reference: window over EVERY host
    import org.apache.spark.sql.expressions.Window
    val want = df.withColumn("rn", row_number().over(
        Window.partitionBy("host").orderBy(col("q").desc, col("id").asc)))
      .filter(col("rn") <= 5).select("id").as[Long].collect().toSet
    assert(got == want)
    // the farm kept its 5 HIGHEST-q docs (ids 1..5 have q 99..95)
    assert(got.intersect((1L to 20L).toSet) == (1L to 5L).toSet)
    // every singleton host passed wholesale
    assert((21L to 50L).toSet.subsetOf(got))
    // partition-independent
    val got2 = Sampling.hostCap(df.repartition(13, col("q")), col("host"),
      Seq(col("q").desc, col("id").asc), k = 5).select("id").as[Long].collect().toSet
    assert(got2 == got)
    // the registered query's fixture really exercises BOTH paths
    val q = QueriesLLM.curateHostCap(spark, sf)
    val perHost = q.groupBy("host").count()
    assert(perHost.filter(col("count") === 5).count() >= 1, "a capped host exists")
    assert(perHost.filter(col("count") < 5).count() >= 1, "an under-cap host exists")
  }

  test("hostCap: NULL hosts form ONE capped group, never an uncapped channel") {
    // unparseable URLs yield NULL hosts; a NULL equi-join key matches
    // nothing, so without the sentinel every NULL row would pass the
    // under-cap path wholesale — asserting the naive-window semantics
    // (all NULLs one partition) instead
    val rows = (1L to 12L).map(i => (i, if (i <= 9) null else s"h$i", 100L - i))
    val df = rows.toDF("id", "host", "q")
    val got = Sampling.hostCap(df, col("host"), Seq(col("q").desc, col("id").asc), k = 4)
      .select("id").as[Long].collect().toSet
    // 9 NULL-host docs capped to their best 4 (ids 1..4); named hosts pass
    assert(got == Set(1L, 2L, 3L, 4L, 10L, 11L, 12L), s"got $got")
  }
}

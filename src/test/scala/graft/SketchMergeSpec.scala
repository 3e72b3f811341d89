package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.plans.MinHashMerge

/** The MinHash union identity: elementwise-min of per-doc signatures ==
  * the signature of the UNION of the docs' shingle sets (min over a union
  * = min of mins — exact, not approximate). */
class SketchMergeSpec extends SparkTestBase {
  import spark.implicits._

  test("minhash_merge(per-doc sigs) == signature of concatenated shingle sets per group") {
    val docs = Tables.documents(spark, sf)
    val sigs = Dedup.minhashSignatures(docs, col("text"), col("doc_id"))
      .join(docs.select("doc_id", "source"), "doc_id")
    val merged = sigs.groupBy("source")
      .agg(MinHashMerge.minhashMerge(col("sig")).as("sig"))
    // reference: min over ALL shingle hashes of the group's docs, per perm
    val ex = graft.functions.TextOps.shingleRows(docs, col("text"), col("doc_id"), 3)
      .join(docs.select("doc_id", "source"), "doc_id")
    val aggs = (0 until 64).map(i => min(xxhash64(col("sh"), lit(i))).as(s"h$i"))
    val want = ex.groupBy("source").agg(aggs.head, aggs.tail: _*)
      .select(col("source"), array((0 until 64).map(i => col(s"h$i")): _*).as("sig"))
    assert(merged.except(want).isEmpty && want.except(merged).isEmpty)
  }

  test("merged sketches estimate cross-source jaccard in [0,1] and self = 1") {
    val docs = Tables.documents(spark, sf)
    val sigs = Dedup.minhashSignatures(docs, col("text"), col("doc_id"))
      .join(docs.select("doc_id", "source"), "doc_id")
    val merged = sigs.groupBy("source")
      .agg(MinHashMerge.minhashMerge(col("sig")).as("sig")).persist()
    val pairs = Dedup.verifyFromSignatures(
      merged.select(col("source").as("a_id")).crossJoin(
        merged.select(col("source").as("b_id"))).filter(col("a_id") <= col("b_id")),
      merged.withColumnRenamed("source", "doc_id"))
    val rows = pairs.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getDouble(2)
      assert(j >= 0.0 && j <= 1.0)
      if (r.getString(0) == r.getString(1)) assert(j == 1.0)
    }
  }

  test("a numPerm mismatch fails loudly instead of silently biasing the sketch") {
    // a truncated merge would leave always-agreeing MaxValue tail
    // positions and inflate est_jaccard — must error, not corrupt
    val sigs = Seq((1L, Array(1L, 2L, 3L))).toDF("doc_id", "sig")
    val ex = intercept[Exception] {
      sigs.agg(MinHashMerge.minhashMerge(col("sig"), numPerm = 64)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("hll sketch union: per-source estimates track exact distinct counts") {
    val tokens = Tables.documents(spark, sf)
      .select(col("source"), col("lang"),
        explode(graft.functions.TextOps.tokens(col("text"))).as("token"))
    // build per-(source,lang), union to per-source — the re-aggregation
    // path — and compare to exact distinct per source
    val est = tokens.groupBy("source", "lang")
      .agg(expr("hll_sketch_agg(token, 12)").as("sk"))
      .groupBy("source")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = tokens.groupBy("source")
      .agg(countDistinct("token").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (src, n) =>
      assert(math.abs(est(src) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$src: est=${est(src)} exact=$n")
    }
  }

  // ---- SpaceSaving heavy hitters -------------------------------------------

  import graft.plans.SpaceSaving

  private def topK(df: org.apache.spark.sql.DataFrame, k: Int, cap: Int): Seq[(String, Long)] =
    df.agg(SpaceSaving.approxTopK(col("item"), k, cap).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.item"), col("t.est_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq

  test("approx_top_k is exact when capacity exceeds the distinct domain") {
    val df = (1L to 3000L).map(i => s"it${i % 40}").toDF("item")
    val got = topK(df, 40, 256).toMap
    val want = df.groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want) // no eviction ever happened ⇒ counts exact
  }

  test("approx_top_k: heavy hitters survive a domain far beyond capacity") {
    // 3000 'hot' (30%) + 7000 distinct cold singletons, capacity 64:
    // freq(hot)=0.3 > 1/64 ⇒ hot is guaranteed present, and its
    // estimate overestimates by at most N/capacity
    val rows = (1L to 3000L).map(_ => "hot") ++ (1L to 7000L).map(i => s"cold$i")
    val df = spark.sparkContext.parallelize(rows, 13).toDF("item")
    val got = topK(df, 5, 64).toMap
    assert(got.contains("hot"), got)
    val n = 10000L
    assert(got("hot") >= 3000L && got("hot") <= 3000L + n / 64 * 13,
      s"est=${got("hot")}") // per-partial εN bound, summed across partials
  }

  test("approx_top_k and minhash_merge are reachable from the SQL surface") {
    graft.plans.GraftExtensions.register(spark)
    (1L to 90L).map(i => s"w${i % 3}").toDF("item").createOrReplaceTempView("ss_sql")
    val rows = spark.sql(
      "SELECT approx_top_k(item, 2, 16) AS top FROM ss_sql")
      .selectExpr("explode(top) AS t").selectExpr("t.item", "t.est_count")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.toSeq == Seq("w0" -> 30L, "w1" -> 30L)) // k=2, tie → item asc
  }

  test("approx_top_k respects k and orders by (count desc, item asc)") {
    val df = (1L to 100L).flatMap(i => Seq.fill(if (i <= 3) 50 else 1)(s"i$i")).toDF("item")
    val got = topK(df, 3, 128)
    assert(got.map(_._1) == Seq("i1", "i2", "i3"))
    assert(got.map(_._2).forall(_ == 50L))
  }
}

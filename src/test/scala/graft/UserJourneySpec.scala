package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}
import graft.sources.FileView

/** The migration journey: what a bridge-analytics-template user does
  * today, done end-to-end with this library's public API — file-view
  * scan, the reference's re-typing pass, quality curation, dedup, a
  * deterministic split, the reference's partitioned S3-style layout, and
  * a pruned read-back. One test, the whole story. */
class UserJourneySpec extends SparkTestBase {

  test("provision-to-dashboard journey over the public API") {
    val dir = java.nio.file.Files.createTempDirectory("journey").toString

    // 1. land raw docs in the reference's {app}/{study} layout
    val docs = Tables.documents(spark, sf)
      .withColumn("app", lit("bridge"))
      .withColumn("study", concat(lit("study"), pmod(col("doc_id"), lit(2))))
    FileView.sinkPartitioned(docs.repartition(col("app"), col("study")),
      s"$dir/raw", Seq("app", "study"))

    // 2. the file view over the landed files: metadata only, no content read
    val view = FileView.scan(spark, s"$dir/raw/*/*/*.parquet")
    assert(view.count() > 0)
    assert(view.columns.toSet == Set("path", "file_size", "file_modified"))

    // 3. re-type pass (the reference's schema-correction moment) on a
    //    string-typed frame
    val stringly = spark.createDataFrame(Seq(
      ("2024-01-01T00:00:00", "true", "7", "ok"),
      ("", "nope", "x", "bad"))).toDF("exportedOn", "schedulePublished", "participantVersion", "name")
    val typed = FileView.retype(stringly)
    val t0 = typed.collect()(0)
    assert(t0.get(0).isInstanceOf[java.sql.Timestamp])
    assert(t0.getBoolean(1) && t0.getInt(2) == 7)
    assert(typed.collect()(1).isNullAt(0)) // malformed -> NULL, not a crash

    // 4. curate: quality gate -> exact dedup -> deterministic split
    val curated = spark.read.parquet(s"$dir/raw")
      .withColumn("quality", graft.functions.TextOps.qualityScore(col("text")))
      .filter(col("quality") >= 0.3)
    val keep = Dedup.exact(curated, col("text"), col("doc_id"))
      .select(col("keep_id").as("doc_id"))
    val split = curated.join(keep, "doc_id")
      .withColumn("split", Sampling.splitColumn(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val bySplit = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val"))

    // 5. publish curated output partitioned by split, read back pruned
    FileView.sinkPartitioned(split.repartition(col("split")),
      s"$dir/curated", Seq("split"))
    val train = spark.read.parquet(s"$dir/curated").filter(col("split") === "train")
    assert(train.count() == bySplit("train"))
    // partition pruning must reach the scan
    val plan = train.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(split"), plan)

    // 6. dashboard aggregate over the curated dataset (the reference's
    //    wiki-graph moment) — plain DataFrame ops on the same session
    val dash = spark.read.parquet(s"$dir/curated")
      .groupBy("split", "lang").agg(count(lit(1)).as("n"),
        graft.functions.Num.r4(avg("quality")).as("avg_q"))
    assert(dash.count() > 0)

    // 7. round-3 hygiene passes compose on the same frames: PII scrub is
    //    a projection, decontamination an anti-join, vocab a bounded agg
    val published = spark.read.parquet(s"$dir/curated")
    val scrubbed = published.withColumn("text",
      regexp_replace(col("text"), "[A-Za-z0-9._%+#-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"))
    assert(scrubbed.count() == published.count())
    val bench = published.limit(2)
    val flagged = graft.operators.Contamination.flagged(
      published, bench, col("text"), col("doc_id"), n = 3)
    // the benchmark docs themselves overlap trivially — they must flag
    assert(flagged.count() >= bench.count())
    val vocab = published
      .select(explode(graft.functions.TextOps.tokens(col("text"))).as("item"))
      .agg(graft.plans.SpaceSaving.approxTopK(col("item"), 5, 64).as("top"))
    assert(vocab.selectExpr("size(top)").head().getInt(0) > 0)

    // 8. round-4 temporal dashboard over the events stream table: gap-free
    //    per-user series (resample + fill) and the signup→purchase funnel —
    //    the time-keyed queries the reference's date_cols re-typing exists for
    val events = Tables.events(spark, sf)
    val series = graft.operators.Temporal.resampleFill(events, "user_id",
      expr("(ts div 1000) div 21600000000"), col("value"), v => sum(v))
    assert(series.filter(col("v_filled").isNull).count() == 0) // gap-free
    val funnel = graft.operators.Temporal.funnel(events, "user_id",
      expr("ts div 1000"), col("event_type"), "signup", "purchase")
    assert(funnel.count() > 0)

    // 9. embedding-side curation: quantize (4× storage) then dedup by
    //    quantization signature on the same session
    val emb = Tables.embeddings(spark, sf)
      .withColumn("scl", graft.functions.VectorOps.int8Scale(col("embedding")))
      .withColumn("qv", graft.functions.VectorOps.quantizeInt8(col("embedding"), col("scl")))
    val reps = emb.groupBy("qv").agg(min("vec_id").as("rep_id"))
    assert(reps.count() <= emb.count() && reps.count() > 0)
  }
}

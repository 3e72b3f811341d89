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
}

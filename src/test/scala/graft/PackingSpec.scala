package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
    .select(col("doc_id"), size(split(lower(col("text")), "\\s+")).as("n_tokens"))

  test("two-phase prefix sum == naive global window (several bucket widths)") {
    val naive = Packing.packChunksNaive(docs, col("doc_id"), col("n_tokens"), 4096L)
    for (bw <- Seq(1L, 7L, 100L, 1000L, 1000000L)) {
      val fast = Packing.packChunks(docs, col("doc_id"), col("n_tokens"), 4096L, bw)
      assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
        s"mismatch at bucketWidth=$bw")
    }
  }

  test("offsets are a contiguous token stream in key order") {
    val rows = Packing.packChunks(docs, col("doc_id"), col("n_tokens"), 4096L)
      .orderBy("doc_id").collect()
    var expected = 0L
    for (r <- rows) {
      assert(r.getAs[Long]("offset") == expected, s"doc ${r.getLong(0)}")
      expected += r.getAs[Long]("n_tokens")
    }
    // chunk ids are non-decreasing and start at 0
    assert(rows.head.getAs[Long]("chunk_id") == 0L)
    assert(rows.sliding(2).forall(p =>
      p.head.getAs[Long]("chunk_id") <= p.last.getAs[Long]("chunk_id")))
  }

  test("the big window is partitioned; only the bucket-totals window is global") {
    val plan = Packing.packChunks(docs, col("doc_id"), col("n_tokens"), 4096L)
      .queryExecution.optimizedPlan.toString
    // two Window nodes: the per-bucket one keyed on __bucket, and the tiny
    // bucket-totals one (global, but over ≤ #buckets rows)
    val windows = "Window \\[".r.findAllIn(plan).size
    assert(windows == 2, plan)
    assert(plan.contains("partitionBy") || plan.contains("__bucket"), plan)
  }
}

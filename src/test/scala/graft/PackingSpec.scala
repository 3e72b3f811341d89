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

  test("shardAssign == naive global row_number; shards exactly shardSize except the last (round 9)") {
    import org.apache.spark.sql.expressions.Window
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
    val u = conv(substring(md5(concat(col("doc_id").cast("string"), lit(":shard"))), 1, 12), 16, 10)
      .cast("long")
    val naive = ids.select(col("doc_id"),
        row_number().over(Window.orderBy(u.asc, col("doc_id").asc)).cast("long").as("rank"))
      .withColumn("shard_id", floor((col("rank") - 1) / 100).cast("long"))
    for (buckets <- Seq(1, 8, 1024)) {
      val fast = Packing.shardAssign(ids, col("doc_id"), 100L, buckets = buckets)
      assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
        s"mismatch at buckets=$buckets")
    }
    val sizes = Packing.shardAssign(ids, col("doc_id"), 100L)
      .groupBy("shard_id").count().orderBy("shard_id").collect()
    val n = ids.count()
    sizes.dropRight(1).foreach(r => assert(r.getLong(1) == 100L, r.toString))
    assert(sizes.last.getLong(1) == (if (n % 100 == 0) 100L else n % 100))
    // ranks are a permutation of 1..n (no collision-tie ambiguity)
    val ranks = Packing.shardAssign(ids, col("doc_id"), 100L)
      .select("rank").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (1L to n).toSeq)
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

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training batches (LLM-data-pipeline surface):
  * "concat-and-chunk" — documents are laid out on one global token
  * stream in a deterministic order, and chunk i is tokens
  * [i·C, (i+1)·C). Each doc gets its stream offset and starting chunk
  * (docs may straddle chunk boundaries, as in GPT-style pretraining
  * packing).
  *
  * The computation is a GLOBAL running sum. The naive form —
  * `sum(len) over (order by key)` with no partitioning — collapses onto
  * a single task and is the canonical 100 TB window trap. This
  * implementation is the scalable two-phase prefix sum:
  *
  *   1. bucket rows by a deterministic range of the order key,
  *   2. within-bucket running sum (window partitioned by bucket —
  *      parallel),
  *   3. per-bucket totals (tiny aggregate) prefix-summed and broadcast
  *      back as per-bucket base offsets.
  *
  * The per-bucket totals frame is bounded by the bucket count (≤ a few
  * thousand rows at any scale) — the only sequential step is over THAT,
  * not the data. Results are identical to the naive global window
  * (asserted in PackingSpec, and oracle-gated against DuckDB's
  * `SUM() OVER`).
  */
object Packing {

  /** (doc_id, n_tokens, offset, chunk_id) for every doc: `offset` is the
    * doc's first position on the global token stream ordered by `key`
    * ascending; `chunk_id = floor(offset / chunkSize)`.
    *
    * `bucketWidth` controls phase-1 parallelism: buckets are
    * `floor(key / bucketWidth)` ranges of the (numeric) order key.
    * Correctness does not depend on key density — only the ORDER matters. */
  def packChunks(df: DataFrame, key: Column, len: Column, chunkSize: Long,
      bucketWidth: Long = 1000L): DataFrame = {
    val base = df.select(key.as("doc_id"), len.cast("long").as("n_tokens"),
      floor(key / bucketWidth).cast("long").as("__bucket"))
    // phase 1+2: parallel within-bucket running sums (exclusive prefix)
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("__local_end", sum(col("n_tokens")).over(w))
    // phase 3: per-bucket totals — bounded rows — exclusive-prefix-summed
    // by one tiny single-partition window, then broadcast back
    val bucketBases = base.groupBy("__bucket")
      .agg(sum("n_tokens").as("__total"))
      .withColumn("__base",
        coalesce(sum(col("__total")).over(
          Window.orderBy(col("__bucket").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)), lit(0L)))
      .select("__bucket", "__base")
    local.join(broadcast(bucketBases), "__bucket")
      .select(col("doc_id"), col("n_tokens"),
        (col("__base") + col("__local_end") - col("n_tokens")).as("offset"),
        floor((col("__base") + col("__local_end") - col("n_tokens")) / chunkSize)
          .cast("long").as("chunk_id"))
  }

  /** The naive single-window form (no partitioning — serializes onto one
    * task; kept as the semantics reference for PackingSpec). */
  def packChunksNaive(df: DataFrame, key: Column, len: Column, chunkSize: Long): DataFrame = {
    val w = Window.orderBy(key.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    df.select(key.as("doc_id"), len.cast("long").as("n_tokens"),
        coalesce(sum(len.cast("long")).over(w), lit(0L)).as("offset"))
      .withColumn("chunk_id", floor(col("offset") / chunkSize).cast("long"))
  }
}

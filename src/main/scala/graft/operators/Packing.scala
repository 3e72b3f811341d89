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

  /** Deterministic shuffled sharding — the training-data layout step
    * after curation: give every doc a pseudo-random but reproducible
    * position (48-bit md5-prefix coordinate, the engine-portable
    * uniform key of [[Sampling]]), then cut the shuffled order into
    * fixed-size shards. Equal-SIZE shards need global RANKS, not
    * hash-mod buckets (mod gives Poisson-sized shards — ±√S wobble that
    * breaks "every shard is exactly one training file" contracts), so
    * this is the same scalable two-phase prefix rank as [[packChunks]]:
    * the 48-bit coordinate space is range-bucketed (value ranges of a
    * uniform key ⇒ near-equal bucket volumes at any scale), ranks are
    * computed within buckets in parallel, and only the tiny per-bucket
    * count frame is prefix-summed serially and broadcast back.
    *
    * Ties on the 48-bit coordinate (2⁻⁴⁸ per pair) are broken by id so
    * the rank — and every downstream shard file — is bit-reproducible
    * across engines and cluster layouts. `id` must be UNIQUE: duplicate
    * ids share a coordinate AND the tie-break, leaving their relative
    * rank partition-order-dependent. */
  def shardAssign(df: DataFrame, id: Column, shardSize: Long,
      salt: String = "shard", buckets: Int = 1024): DataFrame = {
    val coordSpace = 281474976710656L // 2^48
    val bucketWidth = coordSpace / buckets
    val u = conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 12), 16, 10)
      .cast("long")
    val base = df.select(id.as("doc_id"), u.as("__u"))
      .withColumn("__bucket", floor(col("__u") / bucketWidth).cast("long"))
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(col("__u").asc, col("doc_id").asc)
    val local = base.withColumn("__rn", row_number().over(w).cast("long"))
    val bucketBases = base.groupBy("__bucket")
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__base",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__bucket").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)), lit(0L)))
      .select("__bucket", "__base")
    local.join(broadcast(bucketBases), "__bucket")
      .select(col("doc_id"),
        (col("__base") + col("__rn")).as("rank"),
        floor((col("__base") + col("__rn") - 1) / shardSize).cast("long").as("shard_id"))
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

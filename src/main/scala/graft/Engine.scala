package graft

import org.apache.spark.sql.SparkSession

/** Session factory / configuration for the graft engine.
  *
  * The reference (Sage-Bionetworks/bridge-analytics-template) provisions an
  * analytics surface over S3/Parquet study data
  * (`src/copy_from_template.py:316-327`); our engine is the Spark-native
  * execution side of that surface. One object owns every session-level
  * setting so Verify / Bench / tests / user code agree on semantics.
  *
  * Scale notes (100 TB design point):
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  *    replace hand-tuned partition counts when the same plan runs at 1000×.
  *  - `shufflePartitions` defaults to the local core count; on a real
  *    cluster this is overridden (or left to AQE's coalescing) — the engine
  *    never hard-codes 200.
  *  - `nanosAsLong`: the `events` fixture carries Parquet
  *    `INT64 (TIMESTAMP(NANOS,false))`, which Spark 4 rejects by default.
  *    We read it as BIGINT nanoseconds and convert explicitly at use sites
  *    (see SURVEY.md §1.3, §7.4.3) — cheaper than a timestamp decode and
  *    keeps the vectorized reader on the fast path.
  */
object Engine {

  /** Apply the engine's required configs to an arbitrary builder. */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // honor KeyGroupedPartitioning reported by V2 sources (the file
      // manifest reports `dir`), so per-study aggregations and
      // storage-partitioned joins skip the shuffle
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // request >= core-count input splits for small files. Parquet can
      // only split at row-group boundaries (the fixtures are single-group,
      // so this is best-effort there — operators whose parallelism must
      // not depend on the input's split count add their own distribution,
      // e.g. jaccardPairs' posting repartition); multi-group files and
      // JSON/CSV do split. On a 100 TB cluster inputs are already
      // thousands of splits.
      .config("spark.sql.files.minPartitionNum", shufflePartitions.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")

  /** Standalone session for tests / interactive use. */
  def session(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = configure(
      SparkSession.builder().master(master).appName("graft"),
      shufflePartitions
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables — the co-located-join strategy for
  * repeated large-scale joins (SURVEY.md §1.2, §4.2).
  *
  * Writing both join sides bucketed by the join key with the same bucket
  * count lets every subsequent join run with **zero shuffle**: Spark's
  * `EnsureRequirements` sees `HashPartitioning(key, n)` already satisfied
  * on both sides and plans a sort-merge join without exchanges. At 100 TB
  * this converts the dominant repeated cost (full re-shuffle of the fact
  * table per join) into a one-time layout cost at ingest.
  *
  * BucketingSpec asserts the no-exchange plan on real tables.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sortBy: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(buckets, key)
    sortBy.fold(w)(s => w.sortBy(s)).format("parquet").saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — planner elides
    * both exchanges. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Key-distribution helper for operators that pre-shuffle a frame onto
  * its join key and then reuse that partitioning (cached or
  * checkpointed) across a self-join or an iterative loop.
  *
  * Why the partition count is pinned explicitly: a bare
  * `repartition(cols…)` leaves the count to AQE, and on a small exchange
  * AQE's coalescing collapses it — measured down to ONE partition on the
  * 32 k-row banded frame of the LSH candidate join, which then ran its
  * 2 M-row self-join in a single task (the r03 `sim_knn_graph` bench
  * regression). A user-specified partition count is exempt from AQE
  * coalescing, so the cached partitioning keeps the session's
  * parallelism. At cluster scale the session default is sized to the
  * cluster, so pinning it is the same decision the engine already makes
  * for `spark.sql.shuffle.partitions`.
  */
object Dist {

  /** `df.repartition(cols…)` with the session's shuffle-partition count
    * made explicit (AQE-coalesce-proof). */
  def byKeys(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions, cols: _*)
}

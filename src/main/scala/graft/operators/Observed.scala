package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** FREE pipeline accounting: `observe` attaches aggregate metrics
  * (row counts, token sums, null rates…) that are computed BY THE SAME
  * JOB that produces the stage's output — an `AggregatingAccumulator`
  * rides the existing tasks, so at 100 TB the bookkeeping costs zero
  * extra passes, where a separate `df.count()` / `df.agg(...)` would
  * re-read the stage input. The curation pipelines use this shape for
  * kept/dropped accounting; ObservedSpec asserts both the values and
  * the job count (one job, not two).
  */
object Observed {

  /** Attach named metrics to a stage; read `obs.get` AFTER an action has
    * consumed the returned frame (it blocks until the metrics arrive). */
  def withMetrics(df: DataFrame, name: String, metrics: Seq[Column]): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "need at least one metric column")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}

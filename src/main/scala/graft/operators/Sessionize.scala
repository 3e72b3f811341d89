package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Num.r4

/** Event-time windowing over a BIGINT-nanosecond timestamp column
  * (the `events.ts` physical type, SURVEY.md §1.3) — batch forms of the
  * §2.9 streaming ops. The same expressions run under `readStream`
  * unchanged (Structured Streaming's batch/stream unification);
  * see [[graft.streaming.StreamOps]] for the streaming entry points.
  *
  * Scale: tumbling/sliding aggregation is a single shuffle on
  * (window, keys); session windows shuffle on the user key then merge
  * sorted runs per key — both linear. Sliding windows multiply rows by
  * (window/slide) before the shuffle; we aggregate partially per slide
  * first when the ratio is large.
  */
object Sessionize {

  /** BIGINT nanos → TIMESTAMP (UTC session), truncated to whole seconds so
    * Spark and the DuckDB oracle divide identically (SURVEY.md §7.4.3).
    * Exact integer division — see [[graft.functions.TimeOps]]. */
  def nanosToTs(ns: Column): Column = graft.functions.TimeOps.nsToTs(ns)

  /** Tumbling event-time windows: one row per (window, keys...) with count
    * and sum. Window start reported as epoch seconds (BIGINT). */
  def tumbling(df: DataFrame, tsNanos: Column, widthSec: Long, keys: Seq[Column], value: Column): DataFrame = {
    val win = window(nanosToTs(tsNanos), s"$widthSec seconds")
    df.groupBy((win +: keys): _*)
      .agg(count(lit(1)).as("n_events"), r4(sum(value)).as("sum_value"))
      .select((Seq(col("window.start").cast("long").as("win_start")) ++ keys ++ Seq(col("n_events"), col("sum_value"))): _*)
  }

  /** Sliding event-time windows (width, slide). Each event lands in
    * width/slide windows; Spark expands then aggregates. */
  def sliding(df: DataFrame, tsNanos: Column, widthSec: Long, slideSec: Long, keys: Seq[Column]): DataFrame = {
    val win = window(nanosToTs(tsNanos), s"$widthSec seconds", s"$slideSec seconds")
    df.groupBy((win +: keys): _*)
      .agg(count(lit(1)).as("n_events"))
      .select((Seq(col("window.start").cast("long").as("win_start")) ++ keys ++ Seq(col("n_events"))): _*)
  }

  /** Session windows per key with a fixed inactivity gap: a new session
    * starts when the time since the previous event is >= gap (matches
    * `session_window`'s half-open [t, t+gap) semantics). Uses Spark's
    * native `session_window` — the gaps-and-islands recomputation lives in
    * the test suite as the property check. */
  def sessions(df: DataFrame, tsNanos: Column, gapSec: Long, key: Column): DataFrame =
    df.groupBy(session_window(nanosToTs(tsNanos), s"$gapSec seconds"), key)
      .agg(count(lit(1)).as("n_events"))
      .select(key, col("session_window.start").cast("long").as("session_start"), col("n_events"))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Event-time helpers for the BIGINT-nanosecond timestamp encoding
  * (`events.ts`, SURVEY.md §1.3).
  *
  * Exactness matters: `(ns / 1e9).cast(long)` goes through DOUBLE, whose
  * 53-bit mantissa cannot represent 2024-era nanosecond epochs (~1.7e18,
  * ulp = 256 ns) — rows within ~130 ns of a second boundary would land in
  * the wrong second vs DuckDB's integer `//`. We instead subtract
  * `pmod(ns, 1e9)` first: the multiple-of-1e9 intermediate is exactly
  * representable (1e9 = 2^9·1953125, so the mantissa needs ≤ 52 bits) and
  * the division is then exact.
  */
object TimeOps {

  /** Exact floor(ns / 1e9) for non-negative BIGINT nanoseconds. */
  def nsToSec(ns: Column): Column =
    ((ns - pmod(ns, lit(1000000000L))) / lit(1000000000L)).cast("long")

  /** BIGINT nanos → TIMESTAMP truncated to whole seconds (UTC session). */
  def nsToTs(ns: Column): Column = timestamp_seconds(nsToSec(ns))

  /** Exact floor(ns / 1000): microseconds — the finest granularity DuckDB
    * preserves from a Parquet NANOS column (its reader truncates to µs, so
    * oracle-compared event-time arithmetic must happen in µs). A single
    * pmod trick is NOT exact here (ns/2³ needs 58 mantissa bits), so we
    * split: ns div 1e9 (exact) recombined with (ns mod 1e9) div 1e3
    * (operands < 1e9, exact). */
  def nsToUs(ns: Column): Column = {
    val q9 = nsToSec(ns)
    val r9 = pmod(ns, lit(1000000000L))
    val r9us = ((r9 - pmod(r9, lit(1000L))) / lit(1000L)).cast("long")
    (q9 * lit(1000000L) + r9us).cast("long")
  }
}

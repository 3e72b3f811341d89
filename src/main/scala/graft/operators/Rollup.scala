package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Algebraic incremental rollup maintenance (incremental view
  * maintenance for distributive aggregates): keep a per-key frame of
  * PARTIAL aggregates (count / sum / min / max — each mergeable by its
  * own operation), and fold a new delta batch in by merging partials
  * instead of re-reading the fact table. The 100 TB shape: the stored
  * rollup is keys × 4 longs, the delta pass touches only the delta, and
  * the merge shuffles only partial rows — the full corpus is read ONCE
  * ever, at bootstrap. Derived values (avg) are computed from the merged
  * partials at read time, never maintained.
  *
  * Exactness: callers pass an integer measure (e.g. price quantized to
  * cents) so the sum is LONG — associative and commutative, identical
  * under any batch arrival order, partitioning, or merge tree. That is
  * the algebra that makes `merge(partials(a), partials(b)) ≡
  * partials(a ∪ b)` a bit-exact identity, not an approximation
  * (mirrored by `rollup_incremental`'s oracle, which recomputes from
  * the full fact table).
  */
object Rollup {

  /** One partial-aggregate pass: keys → (n_rows, sum_m, min_o, max_o).
    * One map-side-combined exchange of the input. */
  def partials(facts: DataFrame, keys: Seq[String], measure: Column,
      ordered: Column): DataFrame =
    facts.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      sum(measure).as("sum_m"),
      min(ordered).as("min_o"),
      max(ordered).as("max_o"))

  /** Merge partial frames by each aggregate's own merge operation
    * (count→sum, sum→sum, min→min, max→max). Input frames must carry
    * [[partials]]' schema. Shuffles only partial rows — never facts. */
  def merge(keys: Seq[String], parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty)
    parts.reduce(_.unionAll(_)).groupBy(keys.map(col): _*).agg(
      sum("n_rows").as("n_rows"),
      sum("sum_m").as("sum_m"),
      min("min_o").as("min_o"),
      max("max_o").as("max_o"))
  }
}

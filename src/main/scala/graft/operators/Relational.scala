package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core: filters, joins, set ops, sort/top-k, cardinality guards.
  *
  * These wrap Spark's declarative API so Catalyst keeps full visibility
  * (pushdown, pruning, join selection, AQE). The semantics mirror the
  * reference's imperative moments (SURVEY.md §2 table): entity filters
  * (`src/copy_from_template.py:105-112,128-132,149-151`), the ACL anti-join
  * (`:253-261`), scope-set membership (`:109-111`), and the exactly-one
  * guard (`:113-121,133-141,152-160`).
  */
object Relational {

  /** Cardinality guard: the reference's "exactly one entity or raise"
    * pattern (`copy_from_template.py:113-121`). Uses `limit(2)` so at most
    * two rows cross the driver boundary — never a full collect. */
  def exactlyOne(df: DataFrame, what: String = "row"): org.apache.spark.sql.Row = {
    val rows = df.limit(2).collect()
    require(rows.length == 1, s"expected exactly one $what, found ${if (rows.isEmpty) 0 else "multiple"}")
    rows(0)
  }

  /** One data-quality check: count rows violating `bad` in a single
    * exact aggregate (constant-size buffers, map-side combined) — the
    * per-table building block of the `dq_audit` report. Violations are
    * COUNTED, never collected; listing offenders is a pushed-filter scan
    * the caller writes separately. */
  def dqCheck(df: DataFrame, name: String, bad: Column): DataFrame =
    df.agg(count(when(bad, 1)).as("n_violations"), count(lit(1)).as("n_checked"))
      .select(lit(name).as("check_name"), col("n_violations"), col("n_checked"))

  /** Referential-integrity check: `fact` rows whose `factKey` has no
    * match in `dim.dimKey`, counted in the same pass that counts the
    * fact (ONE left join co-keyed on the fact's join column). The dim
    * side is DEDUPLICATED first — a duplicated dimension key (exactly
    * the dirty data a DQ audit targets) must not multiply matched fact
    * rows and inflate `n_checked`. A NULL `factKey` satisfies the
    * constraint (SQL FK semantics — a missing value is not a dangling
    * reference; audit null rates with a separate [[dqCheck]]). */
  def dqCheckFk(fact: DataFrame, factKey: Column, dim: DataFrame, dimKey: Column,
      name: String): DataFrame =
    fact.join(dim.select(dimKey.as("__dq_dim_key")).distinct(),
        factKey === col("__dq_dim_key"), "left")
      .agg(count(when(factKey.isNotNull && col("__dq_dim_key").isNull, 1))
          .as("n_violations"),
        count(lit(1)).as("n_checked"))
      .select(lit(name).as("check_name"), col("n_violations"), col("n_checked"))

  /** Inner equi-join with optional broadcast of the (small) right side.
    * Scale: broadcast eliminates the shuffle entirely for bounded dims;
    * otherwise Spark shuffles both sides on the key (sort-merge / AQE). */
  def joinInner(left: DataFrame, right: DataFrame, keys: Seq[String], broadcastRight: Boolean = false): DataFrame =
    left.join(if (broadcastRight) broadcast(right) else right, keys, "inner")

  def joinLeft(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_outer")

  def joinRight(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "right_outer")

  /** Full outer join — the reconciliation/diff shape (the ACL copy
    * preserving unmatched grants on both sides,
    * `copy_from_template.py:253-261`). Scale: full outer can never
    * broadcast; both sides shuffle on the key — which is the correct and
    * only plan, so AQE handles skew and nothing else is needed. */
  def joinFull(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "full_outer")

  /** Existence join — scope-set membership (`copy_from_template.py:109-111`).
    * Scale: semi-joins shuffle only the key columns of the right side. */
  def joinSemi(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")

  /** Exclusion join — the ACL principal skip (`copy_from_template.py:253-254`). */
  def joinAnti(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** Theta/range join: left rows matched to right band rows by a range
    * predicate. The band side is expected to be small and is broadcast,
    * making this a broadcast-nested-loop with no shuffle of the big side —
    * the only scalable plan for a pure range predicate. */
  def joinBand(big: DataFrame, bands: DataFrame, cond: Column): DataFrame =
    big.join(broadcast(bands), cond)

  /** Interval-overlap self/two-sided join with an equi key. The equi key
    * keeps it a shuffled hash join (partitioned by key) with the range
    * condition applied post-match — linear in key-group size, not O(n²)
    * overall. Callers at 100 TB must supply an equi key or bucketize time. */
  def joinInterval(left: DataFrame, right: DataFrame, equiKeys: Seq[String], overlap: Column): DataFrame = {
    val cond = equiKeys.map(k => left(k) === right(k)).reduce(_ && _) && overlap
    left.join(right, cond)
  }

  /** MERGE / upsert (SCD-1): apply `source` rows onto `target` by `key` —
    * matched keys take the source's non-NULL column values (NULL source
    * cells keep the target's value: partial updates compose), unmatched
    * source keys are inserts, unmatched target keys pass through. The
    * declarative form is one full-outer join + per-column COALESCE, so
    * Catalyst keeps join selection: both sides shuffle on the key (a full
    * outer can't broadcast), AQE splits skewed keys. At 100 TB the source
    * batch is usually ≪ target; the shuffle moves each side once — the
    * same cost profile as Delta/Iceberg's copy-on-write MERGE planning. */
  def mergeUpsert(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val t = target.as("mu_t")
    val s = source.as("mu_s")
    val merged = t.join(s, col(s"mu_t.$key") === col(s"mu_s.$key"), "full_outer")
    val cols = coalesce(col(s"mu_s.$key"), col(s"mu_t.$key")).as(key) +:
      target.columns.filterNot(_ == key).toSeq.map { c =>
        coalesce(col(s"mu_s.$c"), col(s"mu_t.$c")).as(c)
      }
    merged.select(cols: _*)
  }

  /** Multi-key total sort. Spark plans a range-partitioned global sort
    * (sampling-based partitioner) — no single-node bottleneck. */
  def sortMulti(df: DataFrame, keys: Column*): DataFrame = df.orderBy(keys: _*)

  /** Top-k: ORDER BY + LIMIT. Catalyst plans `TakeOrderedAndProject` —
    * per-partition heaps + driver merge of k rows, never a full sort. */
  def topK(df: DataFrame, k: Int, keys: Column*): DataFrame = df.orderBy(keys: _*).limit(k)
}

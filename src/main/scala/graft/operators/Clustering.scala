package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact fixed-round Lloyd k-means over an embedding column — the
  * clustering primitive behind topic bucketing, IVF coarse quantizers
  * and diversity-aware corpus curation (reference scope: the analytics
  * view's derived-signal columns, `src/copy_from_template.py:303-363`,
  * generalized to the vector surface).
  *
  * Cross-engine determinism (SURVEY §7.4): every arithmetic step that
  * feeds a comparison is EXACT —
  *  - components quantize to integer micro-units once
  *    (`floor(x·10⁶+0.5)`), so squared L2 distances are exact BIGINT
  *    sums (≤ 64·(2·10⁶)² ≈ 2.6·10¹⁴, far under Long.Max);
  *  - assignment is argmin over (d2, clusterId) — the tie-break is part
  *    of the contract, not an accident;
  *  - updated centroids re-quantize to the SAME integer grid via
  *    `floor(sum/n + 0.5)`: one correctly-rounded IEEE division on both
  *    engines, so round r+1 starts from bit-identical state.
  * Seeds are the k smallest `vec_id`s (deterministic, SQL-expressible);
  * an emptied cluster keeps its previous centroid.
  *
  * Scale shape (100 TB): per round, ONE scan of the fact table → a
  * narrow codegen'd HOF argmin against k·dims BROADCAST-LITERAL
  * centroids (no join, no shuffle of vectors) → one map-side-combined
  * aggregate whose exchange carries k·dims cells per partition. The
  * only driver materialization is that k·dims centroid table per round
  * (k=4, dims=64 ⇒ 256 longs) — the bounded-collect inventory pattern
  * of [[graft.operators.Similarity]]'s IVF path. The fact table is
  * re-scanned per round rather than checkpointed: for a parquet-backed
  * 100 TB corpus a pushed-down two-column re-scan is cheaper than
  * materializing the quantized projection into executor storage.
  */
object Clustering {

  private val Q = 1000000L

  /** argmin over broadcast-literal centroids: array_min over
    * struct(d2, cl) — lexicographic struct ordering gives (min d2, tie
    * → smallest cluster id) in one codegen'd expression. */
  private def bestOf(centroids: Array[Array[Long]]): Column = {
    val cands = centroids.zipWithIndex.map { case (c, i) =>
      struct(
        aggregate(
          zip_with(col("qe"), typedLit(c.toSeq), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v).as("d2"),
        lit(i + 1).as("cl"))
    }
    array_min(array(cands.toIndexedSeq: _*))
  }

  /** Runs `rounds` Lloyd updates from the k-smallest-id seeds and
    * returns the final assignment `(vec_id, cluster, d2)` ordered by
    * `vec_id`. `emb` must have (`vec_id`, `embedding: array<float>`)
    * with non-null, equal-length vectors. */
  def kmeansExact(emb: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val q = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * Q + lit(0.5)).cast("long")).as("qe"))

    // seeds: the k smallest vec_ids' quantized vectors (bounded: k rows)
    var centroids: Array[Array[Long]] = q.orderBy(col("vec_id")).limit(k)
      .collect()
      .map(_.getSeq[Long](1).toArray)
    require(centroids.nonEmpty, "kmeansExact needs at least one input vector")

    for (_ <- 1 to rounds) {
      // one scan: narrow argmin, then a k·dims-cell aggregate; the
      // re-quantized means come back as a bounded k·dims collect
      val updated = q
        .select(col("qe"), bestOf(centroids).getField("cl").as("cl"))
        .select(col("cl"), posexplode(col("qe")).as(Seq("pos", "x")))
        .groupBy("cl", "pos")
        .agg(floor(sum("x") / count(lit(1)) + lit(0.5)).cast("long").as("c"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cl, rows) =>
          cl -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toArray
        }
      // an emptied cluster keeps its previous centroid
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        updated.getOrElse(i + 1, old)
      }
    }

    q.select(col("vec_id"),
        bestOf(centroids).as("best"))
      .select(col("vec_id"),
        col("best").getField("cl").as("cluster"),
        col("best").getField("d2").as("d2"))
      .orderBy("vec_id")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011): split each embedding into
  * `subspaces` contiguous sub-vectors, train an independent exact-Lloyd
  * codebook per subspace ([[Clustering.trainCentroids]] — same seeds,
  * grid and tie-break contract as `cluster_kmeans`), and encode every
  * vector as one small code per subspace. With S subspaces × k codes a
  * 64-float vector compresses to S bytes while distances remain
  * approximable per-subspace — THE standard memory layout for
  * billion-scale ANN (IVF-PQ).
  *
  * Scale shape: training is S independent bounded loops, each the
  * `cluster_kmeans` discipline (per round ONE pushed-down scan of the
  * slice, narrow broadcast-literal argmin, k·dims-cell map-side-combined
  * aggregate; driver state bounded at k·dims longs per subspace —
  * GuardSpec-inventoried via trainCentroids). ENCODING is a single
  * narrow codegen pass: all S codebooks ride the expression as
  * broadcast literals, so the fact table is scanned once and never
  * shuffled — the plan a per-subspace join would have turned into S
  * exchanges.
  *
  * Determinism: every trained codebook is a pure function of the input
  * (exact-integer Lloyd), and each code is the (d2, cl)-tie-broken
  * argmin on the 10⁻⁶ grid — the oracle replays all S training chains
  * as CTEs and joins the S assignments.
  */
object Pq {

  /** `(vec_id, c0 … c{S-1})` ordered by `vec_id`: the per-subspace
    * codes (1-based cluster ids). `dims` must be divisible by
    * `subspaces`; `emb` needs (`vec_id`, `embedding: array<float>`). */
  def pqCodes(emb: DataFrame, dims: Int, subspaces: Int, k: Int,
      rounds: Int): DataFrame = {
    require(subspaces >= 1 && dims % subspaces == 0,
      s"dims $dims must be divisible by subspaces $subspaces")
    val d = dims / subspaces
    val codebooks = (0 until subspaces).map { s =>
      Clustering.trainCentroids(
        emb.select(col("vec_id"),
          slice(col("embedding"), s * d + 1, d).as("embedding")),
        k, rounds)
    }
    emb.select(col("vec_id") +:
        codebooks.zipWithIndex.map { case (cents, s) =>
          Clustering.argminCluster(
            Clustering.quantized(slice(col("embedding"), s * d + 1, d)),
            cents).as(s"c$s")
        }: _*)
      .orderBy("vec_id")
  }
}

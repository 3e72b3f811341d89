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
    // all S chains train in SHARED jobs — one seed collect + one
    // scan/aggregate per round instead of S·(rounds+1) sequential jobs
    // (bit-identical codebooks; Clustering.trainCentroidsMulti)
    val codebooks = Clustering.trainCentroidsMulti(emb,
      (0 until subspaces).map(s => (s * d, d, k)), rounds)
    emb.select(col("vec_id") +:
        codebooks.zipWithIndex.map { case (cents, s) =>
          Clustering.argminCluster(
            Clustering.quantized(slice(col("embedding"), s * d + 1, d)),
            cents).as(s"c$s")
        }: _*)
      .orderBy("vec_id")
  }

  /** Asymmetric-distance (ADC) top-k search over the PQ codes — the
    * query half of IVF-PQ (Jégou et al. 2011 §III): the query stays
    * UNQUANTIZED while every corpus vector is represented by its S
    * codes, so per subspace the distance contribution collapses to a
    * lookup in an S×k table computed ONCE from the query against the
    * trained codebooks. adc(v) = Σ_s LUT[s][code_s(v)].
    *
    * Exactness: codebooks are the gated exact-Lloyd chains; the query
    * is quantized to the same 10⁻⁶ grid; every LUT cell is an exact
    * BIGINT Σ(q−c)², so adc is pure integer and the (adc ASC, vec_id
    * ASC) top-k is deterministic on both engines.
    *
    * Scale shape: ONE narrow codegen pass over the corpus — the S
    * codebooks AND the S×k LUT ride the expression as broadcast
    * literals (encode + lookup fused; the fact table never shuffles) —
    * then a TakeOrderedAndProject top-k (partial per partition, never a
    * global sort). Driver state is bounded at S·k·(dims/S) centroid
    * longs + S·k LUT longs + the ONE query row ([[Clustering
    * .trainCentroids]]'s bounded-collect contract extended by a 1-row
    * lookup). */
  def adcTopK(emb: DataFrame, queryId: Long, dims: Int, subspaces: Int,
      k: Int, rounds: Int, topK: Int): DataFrame = {
    require(subspaces >= 1 && dims % subspaces == 0,
      s"dims $dims must be divisible by subspaces $subspaces")
    val d = dims / subspaces
    // shared-job training (see pqCodes) — bit-identical codebooks
    val codebooks = Clustering.trainCentroidsMulti(emb,
      (0 until subspaces).map(s => (s * d, d, k)), rounds)
    // the one-row query fetch (bounded by construction)
    val qRows = emb.filter(col("vec_id") === queryId)
      .select(Clustering.quantized(col("embedding"))).limit(2).collect()
    require(qRows.length == 1, s"query vec_id $queryId must match exactly one row")
    val qq = qRows(0).getSeq[Long](0).toArray
    require(qq.length == dims, s"query has ${qq.length} dims, expected $dims")
    val lut: IndexedSeq[Array[Long]] = (0 until subspaces).map { s =>
      codebooks(s).map { cent =>
        (0 until d).map { i =>
          val diff = qq(s * d + i) - cent(i); diff * diff
        }.sum
      }
    }
    val adc = (0 until subspaces).map { s =>
      val code = Clustering.argminCluster(
        Clustering.quantized(slice(col("embedding"), s * d + 1, d)),
        codebooks(s))
      element_at(array(lut(s).map(lit(_)).toIndexedSeq: _*), code)
    }.reduce(_ + _)
    emb.select(col("vec_id"), adc.as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc)
      .limit(topK)
  }

  /** Full IVF-PQ search (Jégou et al. 2011 §IV): a COARSE quantizer
    * (exact-Lloyd over the full vectors, same contract as
    * `cluster_kmeans`) restricts the scan to the query's cell, and ADC
    * ranks only the cell's members — candidate mass n/coarseK expected
    * instead of n, the memory-AND-compute layout behind billion-scale
    * ANN. PQ codebooks are trained on the full corpus (the plain-PQ
    * variant; residual encoding is a declared non-goal — it would break
    * the shared-codebook identity with [[adcTopK]]).
    *
    * Exactness: the query's cell is computed driver-side with the SAME
    * (d2, cl) tie-break as the distributed assignment kernel; everything
    * downstream is [[adcTopK]]'s pure-BIGINT chain — deterministic on
    * both engines, no grid.
    *
    * Scale shape: the cell restriction is a NARROW filter fused into the
    * one scan (the coarse centroids ride the predicate as broadcast
    * literals — no assignment join), then the same fused encode+lookup
    * projection and TakeOrderedAndProject top-k. */
  def ivfAdcTopK(emb: DataFrame, queryId: Long, dims: Int, subspaces: Int,
      k: Int, rounds: Int, coarseK: Int, coarseRounds: Int,
      topK: Int): DataFrame = {
    require(subspaces >= 1 && dims % subspaces == 0,
      s"dims $dims must be divisible by subspaces $subspaces")
    val d = dims / subspaces
    // shared-job training (see pqCodes); when the coarse quantizer runs
    // the same round count it joins the SAME fused jobs as spec 0 —
    // 9 chains, one seed collect, one scan per round
    val (coarse, codebooks) =
      if (coarseRounds == rounds) {
        val all = Clustering.trainCentroidsMulti(emb,
          (0, dims, coarseK) +: (0 until subspaces).map(s => (s * d, d, k)),
          rounds)
        (all.head, all.tail)
      } else {
        (Clustering.trainCentroidsMulti(emb, Seq((0, dims, coarseK)),
            coarseRounds).head,
          Clustering.trainCentroidsMulti(emb,
            (0 until subspaces).map(s => (s * d, d, k)), rounds))
      }
    val qRows = emb.filter(col("vec_id") === queryId)
      .select(Clustering.quantized(col("embedding"))).limit(2).collect()
    require(qRows.length == 1, s"query vec_id $queryId must match exactly one row")
    val qq = qRows(0).getSeq[Long](0).toArray
    require(qq.length == dims, s"query has ${qq.length} dims, expected $dims")
    // the query's coarse cell, driver-side, same (d2, cl) tie-break as
    // the distributed assignment kernel
    val cell = coarse.zipWithIndex.map { case (c, i) =>
      (qq.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, i + 1)
    }.min._2
    val lut: IndexedSeq[Array[Long]] = (0 until subspaces).map { s =>
      codebooks(s).map { cent =>
        (0 until d).map { i =>
          val diff = qq(s * d + i) - cent(i); diff * diff
        }.sum
      }
    }
    val adc = (0 until subspaces).map { s =>
      val code = Clustering.argminCluster(
        Clustering.quantized(slice(col("embedding"), s * d + 1, d)),
        codebooks(s))
      element_at(array(lut(s).map(lit(_)).toIndexedSeq: _*), code)
    }.reduce(_ + _)
    emb.filter(Clustering.argminCluster(
        Clustering.quantized(col("embedding")), coarse) === cell)
      .select(col("vec_id"), adc.as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc)
      .limit(topK)
  }

  /** EXACT integer-grid squared-L2 top-K for a query id — the truth side
    * of [[adcRecall]]: one narrow pass computing the exact BIGINT d2
    * between each quantized vector and the broadcast-literal quantized
    * query, then TakeOrderedAndProject. No quantizer, no codebooks —
    * this is what the ADC rank approximates. Same bounded one-row query
    * fetch as [[adcTopK]] (limit(2) + require(==1)). */
  def exactTopK(emb: DataFrame, queryId: Long, dims: Int, topK: Int): DataFrame = {
    val qRows = emb.filter(col("vec_id") === queryId)
      .select(Clustering.quantized(col("embedding"))).limit(2).collect()
    require(qRows.length == 1, s"query vec_id $queryId must match exactly one row")
    val qq = qRows(0).getSeq[Long](0).toArray
    require(qq.length == dims, s"query has ${qq.length} dims, expected $dims")
    val d2 = aggregate(
      zip_with(Clustering.quantized(col("embedding")), typedLit(qq.toSeq),
        (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    emb.select(col("vec_id"), d2.as("d2"))
      .orderBy(col("d2").asc, col("vec_id").asc)
      .limit(topK)
  }

  /** The PQ quantization-loss audit an IVF-PQ deployment actually
    * watches (round-10 verdict ask #7): recall@`topK` of [[adcTopK]]'s
    * approximate rank against [[exactTopK]]'s exact squared-L2 truth
    * UNDER THE SAME METRIC (both L2 on the 10⁻⁶ grid — measuring an L2
    * quantizer against a cosine truth would conflate metric disagreement
    * with quantization loss). One output row
    * (n_true, n_hit, recall); hits are an integer semi-join count and
    * recall is ONE r8 IEEE division — the `eval_ann_recall` gating
    * recipe. Scale shape: two narrow corpus passes (ADC lookup; exact
    * d2), each ending in a bounded TakeOrderedAndProject — at production
    * this audit runs over a query SAMPLE, the standard recall protocol. */
  def adcRecall(emb: DataFrame, queryId: Long, dims: Int, subspaces: Int,
      k: Int, rounds: Int, topK: Int): DataFrame = {
    val approx = adcTopK(emb, queryId, dims, subspaces, k, rounds, topK)
      .select("vec_id")
    // truth feeds TWO consumers (the hit semi-join and the n_true
    // count); cut its topK rows once (round 15) so the exact-d2 corpus
    // pass runs once, not per consumer — at the 100 TB design point
    // that pass is a full scan
    val truth = Checkpointing.cut(
      exactTopK(emb, queryId, dims, topK).select("vec_id"))
    val hit = truth.join(approx, Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    truth.agg(count(lit(1)).as("n_true")).crossJoin(hit)
      .select(col("n_true"), col("n_hit"),
        graft.functions.Num.r8(col("n_hit").cast("double")
          / col("n_true").cast("double")).as("recall"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.functions.Num.r4

/** Similarity search over an `ARRAY<FLOAT>` embedding column
  * (driver north star; SURVEY.md §2.11).
  *
  * Scale design:
  *  - Brute-force top-k against ONE query vector is a broadcast of k=1
  *    rows + a linear scan with `TakeOrderedAndProject` — optimal at any
  *    SF; no shuffle of the corpus.
  *  - All-pairs >= tau uses norm-bound pruning; beyond ~1M vectors the
  *    LSH route replaces it.
  *  - `signRandomProjection` is the ANN scale path: deterministic
  *    pseudo-random hyperplanes derived from xxhash64 (no RNG, no driver
  *    state), 1 bucket shuffle instead of a cross join. Recall is tested
  *    against the brute-force baseline in SimilaritySpec.
  */
object Similarity {

  /** Exact top-k cosine neighbors of one query vector (given as a 1-row
    * DataFrame with `embedding`). Broadcast + scan + top-k heap. */
  def topKCosine(corpus: DataFrame, query: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // query norm rides in the broadcast row — computed once, not per
    // corpus row (same double bit-for-bit: sqrt is deterministic)
    val q = broadcast(query.select(col(vecCol).as("__q"),
      VectorOps.norm(col(vecCol)).as("__qn")))
    corpus.crossJoin(q)
      .select(col(idCol),
        r4(VectorOps.dot(col(vecCol), col("__q")) / (VectorOps.norm(col(vecCol)) * col("__qn"))).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998):
    * greedily pick `k` of the query's top-`pool` cosine candidates, each
    * step maximizing λ·sim(q,d) − (1−λ)·max over already-picked sim(d,s)
    * — the diversity-aware cut a retrieval/RAG reranker runs after ANN
    * recall, so the k results aren't k near-copies of one passage.
    *
    * Determinism: similarities are quantized ONCE to 1e4 micro-units
    * with the r4 floor (the proven cross-engine cosine chain, integer
    * kept undivided); λ enters as integer TENTHS, so every MMR score is
    * pure BIGINT `lambdaTenths·qs − (10−lambdaTenths)·pen` with
    * (score desc, id asc) tie-break — no float comparison anywhere in
    * the selection. The first pick's empty penalty (max over ∅ = 0)
    * makes step 1 ≡ argmax qs, the same uniform formula both engines use.
    *
    * Scale shape: the candidate cut and BOTH similarity passes are the
    * distributed kernels (one corpus scan, localCheckpointed so the
    * collects don't rescan; a pool-sized self-join); ONLY the inherently
    * sequential greedy loop runs on the driver, over bounded state
    * (pool rows + pool² pair sims — the operator's declared contract,
    * zipfFit's top-V pattern). */
  def mmrRerank(corpus: DataFrame, query: DataFrame, k: Int, pool: Int,
      lambdaTenths: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && pool >= k, s"need pool >= k >= 1, got k=$k pool=$pool")
    require(lambdaTenths >= 0 && lambdaTenths <= 10,
      s"lambdaTenths must be 0..10, got $lambdaTenths")
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = broadcast(query.select(col(vecCol).as("__q"),
      VectorOps.norm(col(vecCol)).as("__qn")))
    val cand = corpus.crossJoin(q)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        floor(VectorOps.dot(col(vecCol), col("__q")) /
          (VectorOps.norm(col(vecCol)) * col("__qn")) * 10000 + 0.5)
          .cast("long").as("qs_u"))
      .orderBy(col("qs_u").desc, col("id").asc)
      .limit(pool)
      .localCheckpoint() // one corpus scan feeds both bounded collects
    // bounded collect: pool candidate rows (operator contract)
    val qs = cand.select("id", "qs_u").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val a = cand.select(col("id").as("a_id"), col("v").as("va"),
      VectorOps.norm(col("v")).as("na"))
    val b = cand.select(col("id").as("b_id"), col("v").as("vb"),
      VectorOps.norm(col("v")).as("nb"))
    // bounded collect: pool² pairwise sims (operator contract)
    val pw = a.join(b, col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        floor(VectorOps.dot(col("va"), col("vb")) /
          (col("na") * col("nb")) * 10000 + 0.5).cast("long").as("s_u"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val qsMap = qs.toMap
    val selected = scala.collection.mutable.ArrayBuffer[Long]()
    var remaining = qs.map(_._1).sorted.toVector
    for (_ <- 1 to math.min(k, qs.length)) {
      val pick = remaining.map { id =>
        val pen = if (selected.isEmpty) 0L
          else selected.iterator.map(sid => pw((id, sid))).max
        (lambdaTenths * qsMap(id) - (10 - lambdaTenths) * pen, id)
      }.maxBy { case (score, id) => (score, -id) }._2
      selected += pick
      remaining = remaining.filterNot(_ == pick)
    }
    selected.toSeq.zipWithIndex
      .map { case (id, i) => (i + 1, id, qsMap(id)) }
      .toDF("mmr_rank", idCol, "q_sim_u")
  }

  /** All pairs with cosine >= tau (a_id < b_id). Norm pruning: precompute
    * norms once; the join condition keeps Catalyst free to pick BNLJ at
    * small SF. O(n²) compare — the declared small-SF baseline; LSH is the
    * scale path. */
  def pairsAboveThreshold(corpus: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val withNorm = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorOps.norm(col(vecCol)).as("nrm"))
    // the broadcast-NL join's parallelism is its stream side's partition
    // count — distribute it explicitly so a single-split input does not
    // serialize the O(n²) compare onto one task (explicit count: a bare
    // repartition is an AQE coalesce target, Dist.byKeys)
    val a = Dist.byKeys(withNorm, col("id")).as("a")
    val b = withNorm.as("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        r4(VectorOps.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** Sign-random-projection LSH signature: `bits` hyperplanes, plane i
    * component j = centered xxhash64(i, j) (deterministic). Returns an
    * integer bucket id per row. Per-row codegen kernel
    * ([[graft.plans.TextKernels.srpSketch]]); bit-identical to the HOF
    * form [[srpBucketHof]] (TextKernelsSpec). */
  def srpBucket(vec: Column, bits: Int, seed: Int = 42): Column =
    graft.plans.TextExpressions.srpSketch(vec, bits, seed)

  /** HOF formulation of [[srpBucket]] — interpreted evaluation (Spark
    * HOFs don't codegen); kept as the cross-check baseline. */
  def srpBucketHof(vec: Column, bits: Int, seed: Int = 42): Column = {
    val bitCols = (0 until bits).map { i =>
      // dot(vec, plane_i) where plane_i[j] = xxhash64(seed,i,j) mapped to [-1,1]
      val d = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast("double") *
            (pmod(xxhash64(lit(seed), lit(i), j), lit(2000001L)).cast("double") / lit(1000000.0) - lit(1.0))),
        lit(0.0), (s, x) => s + x)
      when(d > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ bitwiseOR _)
  }

  /** IVF coarse quantizer: deterministic centroids (the `nCentroids`
    * lowest-id corpus vectors — no RNG, no k-means iterations), each
    * corpus vector assigned to its nearest centroid by cosine.
    * Returns (id, vector, centroid_id).
    *
    * Broadcast-literal form (same pattern as LangId scoring): the
    * centroid table is ≤ nCentroids rows, so it is collected once and
    * baked into a per-row argmax expression — assignment is a ZERO-
    * shuffle projection (the relational form's cross join + group-by-
    * vector aggregate disappear). At 100 TB the assignment is written
    * once at ingest and queries touch only `nProbe` cells. Identical to
    * [[ivfAssignRelational]] (DedupSimilaritySpec). */
  def ivfAssign(corpus: DataFrame, nCentroids: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val rows = corpus.orderBy(col(idCol).asc).limit(nCentroids)
      .select(col(idCol).cast("long"), col(vecCol)).collect()
    val index = new graft.plans.CentroidIndex(rows.map(_.getLong(0)),
      rows.map(_.getSeq[Float](1).toArray))
    corpus.select(col(idCol), col(vecCol),
      graft.plans.VectorExpressions.nearestCentroid(col(vecCol), index).as("centroid_id"))
  }

  /** The relational formulation of [[ivfAssign]] (broadcast cross join +
    * max_by aggregate keyed on the vector column) — kept as the
    * cross-check baseline. */
  def ivfAssignRelational(corpus: DataFrame, nCentroids: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = broadcast(
      corpus.orderBy(col(idCol).asc).limit(nCentroids)
        .select(col(idCol).as("centroid_id"), col(vecCol).as("cvec"),
          VectorOps.norm(col(vecCol)).as("cn")))
    corpus.crossJoin(centroids)
      .select(col(idCol), col(vecCol),
        col("centroid_id"),
        (VectorOps.dot(col(vecCol), col("cvec")) / (VectorOps.norm(col(vecCol)) * col("cn"))).as("csim"))
      .groupBy(idCol, vecCol)
      .agg(max_by(col("centroid_id"), struct(col("csim"), -col("centroid_id"))).as("centroid_id"))
  }

  /** Deterministic Lloyd (k-means) refinement of the IVF coarse
    * quantizer: start from the hash-free seed ([[ivfAssign]]'s lowest-id
    * corpus vectors), run `iters` assign→mean rounds. Per round, the
    * assignment is the zero-shuffle broadcast-literal projection and the
    * centroid update is ONE (centroid, dim-position) aggregate whose
    * output is ≤ nCentroids·dim rows — bounded driver traffic, no
    * RNG, no MLlib. Empty cells keep their previous centroid. Returns
    * (centroid_id, vector) pairs for [[ivfTopKWith]].
    *
    * Determinism (ADVICE r02): the per-cell mean is computed from an
    * INTEGER fixed-point sum (`long(x·2²⁴)`), not `avg(double)` — long
    * addition is associative+commutative, so the result is bit-identical
    * under ANY partition count or merge order, where a double partial-sum
    * could drift in the last ulp. The ≤2⁻²⁴ quantization is far below
    * what a coarse quantizer can distinguish. */
  def ivfCentroidsKmeans(corpus: DataFrame, nCentroids: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[(Long, Array[Float])] = {
    val Scale = (1L << 24).toDouble
    val seed = corpus.orderBy(col(idCol).asc).limit(nCentroids)
      .select(col(idCol).cast("long"), col(vecCol)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    var centroids: Array[(Long, Array[Float])] =
      seed.zipWithIndex.map { case ((_, v), i) => i.toLong -> v }
    for (_ <- 1 to iters) {
      val index = new graft.plans.CentroidIndex(centroids.map(_._1), centroids.map(_._2))
      val assigned = corpus.select(col(vecCol).as("v"),
        graft.plans.VectorExpressions.nearestCentroid(col(vecCol), index).as("cid"))
      val means = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum((col("x").cast("double") * lit(Scale)).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val byCid = means.groupBy(_.getLong(0))
      centroids = centroids.map { case (cid, old) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val v = new Array[Float](old.length)
            rows.foreach(r => v(r.getInt(1)) =
              (r.getLong(2).toDouble / Scale / r.getLong(3).toDouble).toFloat)
            cid -> v
          case None => cid -> old // empty cell: centroid unchanged
        }
      }
    }
    centroids
  }

  /** [[ivfTopK]] with caller-supplied centroids (e.g. the k-means-refined
    * set) — same probe-and-rescore plan. */
  def ivfTopKWith(corpus: DataFrame, query: DataFrame, k: Int,
      centroids: Array[(Long, Array[Float])], nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val index = new graft.plans.CentroidIndex(centroids.map(_._1), centroids.map(_._2))
    val assigned = corpus.select(col(idCol), col(vecCol),
      graft.plans.VectorExpressions.nearestCentroid(col(vecCol), index).as("centroid_id"))
    val centroidDf = broadcast(
      centroids.toSeq.toDF("centroid_id", "cvec")
        .select(col("centroid_id"), col("cvec"),
          VectorOps.norm(col("cvec")).as("cn")))
    val qcells = broadcast(
      query.select(col(vecCol).as("__q"), VectorOps.norm(col(vecCol)).as("__qn"))
        .crossJoin(centroidDf)
        .select(col("__q"), col("__qn"), col("centroid_id"),
          (VectorOps.dot(col("__q"), col("cvec")) / (col("__qn") * col("cn"))).as("csim"))
        .orderBy(col("csim").desc, col("centroid_id").asc)
        .limit(nProbe))
    assigned.join(qcells, "centroid_id")
      .select(col(idCol),
        r4(VectorOps.dot(col(vecCol), col("__q")) / (VectorOps.norm(col(vecCol)) * col("__qn"))).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF ANN top-k: probe the `nProbe` centroid cells nearest the query,
    * exact-rescore only those cells' members. The deterministic, shuffle-
    * light alternative to the brute-force cross join; recall rises with
    * nProbe (= exact when nProbe == nCentroids). */
  def ivfTopK(corpus: DataFrame, query: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = ivfAssign(corpus, nCentroids, idCol, vecCol)
    // probe cells: rank centroids by similarity to the query vector
    val centroids = broadcast(
      corpus.orderBy(col(idCol).asc).limit(nCentroids)
        .select(col(idCol).as("centroid_id"), col(vecCol).as("cvec"),
          VectorOps.norm(col(vecCol)).as("cn")))
    val qcells = broadcast(
      query.select(col(vecCol).as("__q"), VectorOps.norm(col(vecCol)).as("__qn"))
        .crossJoin(centroids)
        .select(col("__q"), col("__qn"), col("centroid_id"),
          (VectorOps.dot(col("__q"), col("cvec")) / (col("__qn") * col("cn"))).as("csim"))
        .orderBy(col("csim").desc, col("centroid_id").asc)
        .limit(nProbe))
    assigned.join(qcells, "centroid_id")
      .select(col(idCol),
        r4(VectorOps.dot(col(vecCol), col("__q")) / (VectorOps.norm(col(vecCol)) * col("__qn"))).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Multi-probe ANN top-k: probe the query's SRP bucket AND every bucket
    * at Hamming distance 1 from it (bits+1 probes — the standard
    * multi-probe LSH recall lever: neighbors that differ on one
    * hyperplane sign are recovered without adding tables). Probe list is
    * bits+1 broadcast rows; the corpus-side bucket column is computed
    * once (same kernel as [[annTopK]]); cost grows with probed-bucket
    * volume only, never O(n²). */
  def annTopKMultiProbe(corpus: DataFrame, query: DataFrame, k: Int, bits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = corpus.withColumn("__bucket", srpBucket(col(vecCol), bits))
    val q = broadcast(query.select(col(vecCol).as("__q"),
        srpBucket(col(vecCol), bits).as("__qbucket"),
        VectorOps.norm(col(vecCol)).as("__qn"))
      .select(col("__q"), col("__qn"),
        explode(array(col("__qbucket") +:
          (0 until bits).map(i => col("__qbucket").bitwiseXOR(lit(1L << i))): _*)).as("__probe")))
    bucketed.join(q, col("__bucket") === col("__probe"))
      .select(col(idCol),
        r4(VectorOps.dot(col(vecCol), col("__q")) / (VectorOps.norm(col(vecCol)) * col("__qn"))).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs at scale: banded SRP LSH.
    * One `totalBits = bands·bitsPerBand`-plane sketch per row (a single
    * codegen'd kernel call), exploded into `bands` (band_id, band_bits)
    * keys; vectors agreeing on ALL bits of any band become candidates,
    * which are exactly rescored and filtered at `tau`.
    *
    * The scale path replacing the O(n²) [[pairsAboveThreshold]]: cost is
    * candidates × dim, and candidate volume is tuned by bitsPerBand
    * (collision prob per band = (1 - θ/π)^bitsPerBand). Precision is 1.0
    * by construction (exact rescore); recall rises with `bands` —
    * asserted vs the brute-force truth in TextKernelsSpec. Parameters
    * must match the threshold regime: near-dup thresholds (τ ≥ 0.8, the
    * production dedup case) want long bands (8×8 — tiny candidate sets,
    * recall ≈ 1); loose thresholds like τ = 0.35 want short bands (the
    * 16×4 default — recall ≈ 0.9, but pruning fades as τ → 0; below
    * ~0.3 brute force or IVF is the right tool). The banded frame is
    * persisted across its self-join, like
    * [[graft.operators.Dedup.jaccardPairs]]'s posting frame; the rescore
    * re-joins the corpus by id rather than carrying vectors through the
    * band shuffle (ids are 8 bytes; embeddings are dim·4). */
  def pairsLsh(corpus: DataFrame, tau: Double, bands: Int = 16, bitsPerBand: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding", seed: Int = 42,
      maxBucket: Int = HotBucket.defaultMaxBucket): DataFrame = {
    val cands = lshCandidates(corpus, bands, bitsPerBand, idCol, vecCol, seed, maxBucket)
    val withNorm = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorOps.norm(col(vecCol)).as("nrm"))
    cands
      .join(withNorm.select(col("id").as("a_id"), col("v").as("va"), col("nrm").as("na")), "a_id")
      .join(withNorm.select(col("id").as("b_id"), col("v").as("vb"), col("nrm").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        r4(VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** A banded-LSH configuration. `bands × bitsPerBand` may exceed 64:
    * bands are packed ⌊64/bitsPerBand⌋ per 64-bit sketch WORD, each word
    * its own kernel call with a distinct seed (a band never straddles
    * words). */
  final case class LshParams(bands: Int, bitsPerBand: Int) {
    // 63-bit cap: at 64, (1L << bitsPerBand) - 1 wraps to 0 (JVM shifts
    // are mod 64) and every band's bits mask to zero — all rows would
    // collide in every band with no error raised
    require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 63,
      s"bands=$bands bitsPerBand=$bitsPerBand out of range (1..∞, 1..63)")
    def bandsPerWord: Int = math.max(1, 64 / bitsPerBand)
    def words: Int = (bands + bandsPerWord - 1) / bandsPerWord
  }

  /** Size banded SRP LSH from (corpus size, threshold, recall target) —
    * the classic n^ρ sizing (Indyk–Motwani; Gionis et al., VLDB '99),
    * which the round-8 ×10 scale probe showed fixed parameters need:
    * with band width fixed, RANDOM collisions (p₂ = 1/2 per bit for
    * near-orthogonal vectors) cost ~bands·n²·2^(−r) pairs — super-linear
    * in n. Growing the band width with the corpus keeps them linear:
    *
    *  - `bitsPerBand` r = ⌈log₂ n⌉ (≥ 4) ⇒ expected random candidates
    *    ≈ bands · n²/2^r ≈ bands · n.
    *  - `bands` b solves recall = 1 − (1 − p₁^r)^b at `targetRecall`
    *    for p₁ = 1 − acos(τ)/π ⇒ b ≈ n^ρ · ln(1/(1−recall)),
    *    ρ = ln(1/p₁)/ln(1/p₂) (τ=0.8 ⇒ ρ≈0.33), capped at `maxBands`.
    *
    * The cap is the honesty valve: at LOOSE thresholds (τ ≲ 0.5) p₁
    * approaches p₂ and the required b explodes past any cap — recall
    * collapses and the returned config documents (by its cap) that LSH
    * cannot prune that regime; brute force or IVF is the right tool
    * (the doc on [[pairsLsh]]). Be precise about WHERE the cap binds
    * even at τ = 0.8, recall 0.9: uncapped b ≈ 113 at n = 10⁵ and
    * ≈ 225 at 10⁶ (vs cap 96), so past ~3·10⁴ rows the default cap
    * trades recall (≈ 0.86 at 10⁵, ≈ 0.63 at 10⁶) for bounded band
    * count; the fixture's planted twins sit FAR above worst-case τ, so
    * their realized recall stays ~1 regardless. Callers who need the
    * recall target honored at corpus scale raise `maxBands` (cost is
    * linear in bands) rather than trusting the default. */
  def autoLshParams(n: Long, tau: Double, targetRecall: Double = 0.9,
      maxBands: Int = 96): LshParams = {
    require(n >= 1 && tau > 0 && tau < 1 && targetRecall > 0 && targetRecall < 1)
    val p1 = 1.0 - math.acos(tau) / math.Pi
    val r = math.max(4, math.ceil(math.log(math.max(n, 2).toDouble) / math.log(2.0)).toInt)
    val pr = math.pow(p1, r)
    val b = math.ceil(math.log1p(-targetRecall) / math.log1p(-pr))
    LshParams(math.min(maxBands, math.max(1, b.toInt)), r)
  }

  /** Distinct candidate pairs from banded SRP buckets (a_id < b_id).
    * Hot buckets (over `maxBucket` members — e.g. one embedding duplicated
    * virally) contribute star pairs to their minimum id instead of all
    * pairs ([[HotBucket.guardedSelfJoinPairs]]), capping the one skew case
    * of the banded plan. Multi-word sketches (bands×bits > 64) per
    * [[LshParams]]; for configurations that fit one word the layout and
    * results are bit-identical to the single-kernel form. */
  private def lshCandidates(corpus: DataFrame, bands: Int, bitsPerBand: Int,
      idCol: String, vecCol: String, seed: Int,
      maxBucket: Int = HotBucket.defaultMaxBucket): DataFrame = {
    val p = LshParams(bands, bitsPerBand)
    val sk = corpus.select(col(idCol).as("id") +:
      (0 until p.words).map { w =>
        val bandsInWord = math.min(p.bandsPerWord, bands - w * p.bandsPerWord)
        srpBucket(col(vecCol), bandsInWord * bitsPerBand, seed + w).as(s"__sk$w")
      }: _*)
    val mask = (1L << bitsPerBand) - 1
    // distribution + checkpoint of the banded frame live inside the
    // guard (one explicit bucket-key shuffle, one window, one cache —
    // every downstream branch reads it exchange-free)
    val banded = sk.select(col("id"),
        explode(array((0 until bands).map { bd =>
          val w = bd / p.bandsPerWord
          val off = (bd % p.bandsPerWord) * bitsPerBand
          struct(lit(bd).as("band_id"),
            shiftright(col(s"__sk$w"), off).bitwiseAND(lit(mask)).as("band_bits"))
        }: _*)).as("b"))
      .select(col("id"), col("b.band_id"), col("b.band_bits"))
    HotBucket.guardedSelfJoinPairs(banded, Seq("band_id", "band_bits"), "id", maxBucket)
  }

  /** k-NN graph: the top-`k` cosine neighbors of EVERY corpus vector —
    * the grouped form of ANN (kNN-graph construction for clustering,
    * diversity sampling, graph-based dedup). Candidates come from the
    * banded SRP buckets (symmetric: each pair surfaces for both
    * endpoints), are exactly rescored by id-join (vectors never ride the
    * band shuffle), and a per-source window keeps the k best. Cost is
    * candidate volume × dim + one (src-keyed) window — never O(n²).
    * Recall vs the brute-force kNN graph is asserted in
    * DedupSimilaritySpec; raise `bands` for more recall. */
  def knnGraph(corpus: DataFrame, k: Int, bands: Int = 16, bitsPerBand: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding", seed: Int = 42): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // checkpoint: the symmetrize below reads the candidate frame TWICE —
    // without it the band self-join + distinct execute twice
    val cands = lshCandidates(corpus, bands, bitsPerBand, idCol, vecCol, seed)
      .localCheckpoint(true)
    // symmetrize: every candidate pair is a neighbor CANDIDATE for both ends
    val sym = cands.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionAll(cands.select(col("b_id").as("src"), col("a_id").as("dst")))
    val withNorm = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorOps.norm(col(vecCol)).as("nrm"))
    val scored = sym
      .join(withNorm.select(col("id").as("src"), col("v").as("vs"), col("nrm").as("ns")), "src")
      .join(withNorm.select(col("id").as("dst"), col("v").as("vd"), col("nrm").as("nd")), "dst")
      .select(col("src"), col("dst"),
        r4(VectorOps.dot(col("vs"), col("vd")) / (col("ns") * col("nd"))).as("cosine"))
    val w = Window.partitionBy("src").orderBy(col("cosine").desc, col("dst").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("src"), col("dst"), col("cosine"), col("rk"))
  }

  /** k-NN graph via IVF cells — the scale path for kNN-graph
    * construction when the corpus' neighbor similarities sit BELOW the
    * LSH amplification regime (this fixture's top-5 neighbors run
    * cos ≈ 0.3–0.5, where banded SRP candidates degrade toward all
    * pairs — measured in the round-8 ×10 probe): candidates are pairs
    * sharing a k-means IVF cell, so candidate mass is Σ|cell|² ≈
    * n²/nCentroids — choose nCentroids ≈ n/targetCellSize and total
    * work stays ~n·targetCellSize, LINEAR in n at fixed cell size.
    * Assignment is the zero-shuffle broadcast-literal argmax
    * ([[ivfAssign]]/[[ivfCentroidsKmeans]]); rescore is exact; a
    * per-src window keeps the k best. Recall = probability a true
    * neighbor lands in the same cell (cluster-local by construction;
    * k-means refinement raises it, as does a multi-cell assignment —
    * the standard IVF recall levers). At corpora past ~10⁷ rows the
    * flat centroid argmax (nCentroids·dim per row) wants a trained /
    * hierarchical coarse quantizer instead — the declared boundary of
    * this implementation. */
  def knnGraphIvf(corpus: DataFrame, k: Int, nCentroids: Int, kmeansIters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = ivfCentroidsKmeans(corpus, nCentroids, kmeansIters, idCol, vecCol)
    val index = new graft.plans.CentroidIndex(centroids.map(_._1), centroids.map(_._2))
    // one explicit cell-key shuffle; both self-join sides read the
    // cached cell-partitioned blocks (same discipline as the banded
    // LSH frame)
    val assigned = Dist.byKeys(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
        VectorOps.norm(col(vecCol)).as("nrm"),
        graft.plans.VectorExpressions.nearestCentroid(col(vecCol), index).as("cell")),
      col("cell"))
      .localCheckpoint(true)
    val a = assigned.select(col("cell"), col("id").as("src"), col("v").as("vs"), col("nrm").as("ns"))
    val b = assigned.select(col("cell"), col("id").as("dst"), col("v").as("vd"), col("nrm").as("nd"))
    val w = Window.partitionBy("src").orderBy(col("cosine").desc, col("dst").asc)
    a.join(b, Seq("cell"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        r4(VectorOps.dot(col("vs"), col("vd")) / (col("ns") * col("nd"))).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("src"), col("dst"), col("cosine"), col("rk"))
  }

  /** Exact kNN graph — the brute-force sibling of [[knnGraph]] and the
    * oracle-gatable truth it is recall-tested against: every ordered pair
    * (src ≠ dst) is scored and a per-src window keeps the k best under the
    * (cosine desc, dst asc) deterministic order. O(n²) compare by
    * definition — the DECLARED small-SF baseline; [[knnGraph]] is the
    * scale path (banded candidates, never all-pairs). The stream side is
    * explicitly distributed so a single-split input does not serialize the
    * O(n²) compare onto one task; the dst side rides a broadcast. */
  def knnGraphExact(corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withNorm = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorOps.norm(col(vecCol)).as("nrm"))
    val a = Dist.byKeys(withNorm, col("id"))
      .select(col("id").as("src"), col("v").as("vs"), col("nrm").as("ns"))
    val b = withNorm
      .select(col("id").as("dst"), col("v").as("vd"), col("nrm").as("nd"))
    val w = Window.partitionBy("src").orderBy(col("cosine").desc, col("dst").asc)
    a.join(b, col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        r4(VectorOps.dot(col("vs"), col("vd")) / (col("ns") * col("nd"))).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("src"), col("dst"), col("cosine"), col("rk"))
  }

  /** Candidate-set size for a banding configuration — the observable the
    * pruning claim (and the hot-bucket cap) is tested on (TextKernelsSpec,
    * HotBucketSpec). */
  def pairsLshCandidateCount(corpus: DataFrame, bands: Int, bitsPerBand: Int,
      idCol: String = "vec_id", vecCol: String = "embedding", seed: Int = 42,
      maxBucket: Int = HotBucket.defaultMaxBucket): Long =
    lshCandidates(corpus, bands, bitsPerBand, idCol, vecCol, seed, maxBucket).count()

  /** ANN top-k via SRP bucketing: restrict the exact rescore to the
    * query's bucket (plus optionally nearby buckets at higher recall
    * settings). One groupBy-size shuffle; no cross join. */
  def annTopK(corpus: DataFrame, query: DataFrame, k: Int, bits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = corpus.withColumn("__bucket", srpBucket(col(vecCol), bits))
    val q = broadcast(query.select(col(vecCol).as("__q"),
      srpBucket(col(vecCol), bits).as("__qbucket"),
      VectorOps.norm(col(vecCol)).as("__qn")))
    bucketed.join(q, col("__bucket") === col("__qbucket"))
      .select(col(idCol),
        r4(VectorOps.dot(col(vecCol), col("__q")) / (VectorOps.norm(col(vecCol)) * col("__qn"))).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}

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
  *  - updated centroids re-quantize to the SAME integer grid via the
  *    PURE-BIGINT round-half-up `(2·sum + n) div (2·n)` (floor division
  *    realized as subtract-pmod-then-exact-div, so no double ever
  *    exists in the chain) — round r+1 starts from bit-identical state
  *    on any engine. The earlier `floor(sum/n + 0.5)` form was
  *    version-sensitive at exact-`.5` boundaries (the round-9 driver
  *    hash flake); this is pagerank's quantize-before-float recipe
  *    ([[graft.operators.Graph]]) applied to the one remaining
  *    non-integer step.
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
  private def bestOf(qe: Column, centroids: Array[Array[Long]]): Column = {
    val cands = centroids.zipWithIndex.map { case (c, i) =>
      struct(
        aggregate(
          zip_with(qe, typedLit(c.toSeq), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v).as("d2"),
        lit(i + 1).as("cl"))
    }
    array_min(array(cands.toIndexedSeq: _*))
  }

  /** The (d2, cl)-tie-broken cluster id of a QUANTIZED vector column
    * against broadcast-literal centroids — the assignment kernel alone,
    * exposed for composition ([[graft.operators.Pq]] applies one per
    * subspace in a single narrow pass). */
  def argminCluster(qe: Column, centroids: Array[Array[Long]]): Column =
    bestOf(qe, centroids).getField("cl")

  /** Quantize an `array<float>` embedding column to the 10⁻⁶ integer
    * grid (the exactness contract's first step). */
  def quantized(embedding: Column): Column =
    transform(embedding, x => floor(x.cast("double") * Q + lit(0.5)).cast("long"))

  /** Runs `rounds` Lloyd updates from the k-smallest-id seeds and
    * returns the final assignment `(vec_id, cluster, d2)` ordered by
    * `vec_id`. `emb` must have (`vec_id`, `embedding: array<float>`)
    * with non-null, equal-length vectors. */
  def kmeansExact(emb: DataFrame, k: Int, rounds: Int): DataFrame =
    kmeansAssign(emb, k, rounds).orderBy("vec_id")

  /** [[kmeansExact]] without the presentation sort — the composition
    * surface ([[clusterBalancedSample]] aggregates over it; a sort
    * there would be wasted work). */
  def kmeansAssign(emb: DataFrame, k: Int, rounds: Int): DataFrame = {
    val centroids = trainCentroids(emb, k, rounds)
    emb.select(col("vec_id"), quantized(col("embedding")).as("qe"))
      .select(col("vec_id"),
        bestOf(col("qe"), centroids).as("best"))
      .select(col("vec_id"),
        col("best").getField("cl").as("cluster"),
        col("best").getField("d2").as("d2"))
  }

  /** The Lloyd TRAINING loop alone: `rounds` updates from the
    * k-smallest-id seeds, returning the final quantized centroid table
    * (k × dims longs — the bounded driver state [[kmeansAssign]] and
    * [[graft.operators.Pq]] broadcast back as literals). */
  def trainCentroids(emb: DataFrame, k: Int, rounds: Int): Array[Array[Long]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val q = emb.select(col("vec_id"), quantized(col("embedding")).as("qe"))

    // seeds: the k smallest vec_ids' quantized vectors (bounded: k rows)
    var centroids: Array[Array[Long]] = q.orderBy(col("vec_id")).limit(k)
      .collect()
      .map(_.getSeq[Long](1).toArray)
    require(centroids.nonEmpty, "kmeansExact needs at least one input vector")

    for (_ <- 1 to rounds) {
      // one scan: narrow argmin, then a k·dims-cell aggregate; the
      // re-quantized means come back as a bounded k·dims collect
      // round-half-up mean in pure BIGINT: c = floor((2·Σx + n)/(2n)).
      // num − pmod(num, den) is exactly divisible, so the truncating
      // integral `div` IS floor division — no doubles anywhere.
      val updated = q
        .select(col("qe"), bestOf(col("qe"), centroids).getField("cl").as("cl"))
        .select(col("cl"), posexplode(col("qe")).as(Seq("pos", "x")))
        .groupBy("cl", "pos")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .selectExpr("cl", "pos",
          "(2*s + n - pmod(2*s + n, 2*n)) div (2*n) AS c")
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
    centroids
  }

  /** MANY independent Lloyd chains over SLICES of the same embedding,
    * trained in SHARED jobs (round 15). [[graft.operators.Pq]] trains
    * `subspaces` (+1 coarse) codebooks, every chain scanning the same
    * fact table: as separate [[trainCentroids]] loops that is
    * specs·(rounds+1) sequential driver-blocking jobs — pure scheduler
    * floor at any scale, and specs redundant scans of a 100 TB corpus
    * per round at the design point. Here all chains share ONE seed
    * collect and ONE scan+aggregate per round: each spec's argmin rides
    * the same codegen pass, the per-(spec, cluster, dim) cells ride the
    * same map-side-combined exchange (Σ spec-widths cells per row —
    * identical total row mass to the separate loops), and the bounded
    * collect returns every codebook's update at once.
    *
    * Each `(offset, width, k)` spec trains on `embedding[offset ..
    * offset+width)` exactly as [[trainCentroids]] would on that slice:
    * same k-smallest-id seeds (quantization is elementwise, so
    * slice∘quantize ≡ quantize∘slice), same (d2, cl) argmin, same
    * pure-BIGINT round-half-up means, same emptied-cluster-keeps-
    * previous rule — codebooks are BIT-IDENTICAL to the per-spec loops
    * (property-asserted in ClusteringSpec). */
  def trainCentroidsMulti(emb: DataFrame, specs: Seq[(Int, Int, Int)],
      rounds: Int): IndexedSeq[Array[Array[Long]]] = {
    require(specs.nonEmpty && specs.forall { case (o, w, k) =>
      o >= 0 && w >= 1 && k >= 1 }, s"bad specs $specs")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val q = emb.select(col("vec_id"), quantized(col("embedding")).as("qe"))

    // seeds: ONE bounded collect of the max-k smallest vec_ids' full
    // quantized vectors; each spec slices its own seeds driver-side
    val seedRows = q.orderBy(col("vec_id")).limit(specs.map(_._3).max)
      .collect().map(_.getSeq[Long](1))
    require(seedRows.nonEmpty, "trainCentroidsMulti needs at least one input vector")
    var books: IndexedSeq[Array[Array[Long]]] = specs.toIndexedSeq.map {
      case (off, w, k) => seedRows.take(k).map(_.slice(off, off + w).toArray)
    }

    // the exploded layout is the concatenation of every spec's slice;
    // spec index and in-spec dim are pure functions of the global
    // position, shipped as literal int LUTs (Σ widths entries)
    val spLut = specs.zipWithIndex.flatMap { case ((_, w, _), i) => Seq.fill(w)(i) }
    val posLut = specs.flatMap { case (_, w, _) => 0 until w }
    for (_ <- 1 to rounds) {
      // one scan: every spec's argmin in one narrow pass, then ONE
      // (spec, cluster, dim) aggregate — Σk·w cells, bounded collect
      val cls = array(specs.zipWithIndex.map { case ((off, w, _), i) =>
        bestOf(slice(col("qe"), off + 1, w), books(i)).getField("cl")
      }: _*)
      val catQe = flatten(array(specs.map { case (off, w, _) =>
        slice(col("qe"), off + 1, w) }: _*))
      val updated = q
        .select(cls.as("cls"), catQe.as("cat"))
        .select(col("cls"), posexplode(col("cat")).as(Seq("gpos", "x")))
        .select(
          element_at(typedLit(spLut), col("gpos") + 1).as("sp"),
          element_at(typedLit(posLut), col("gpos") + 1).as("pos"),
          element_at(col("cls"),
            element_at(typedLit(spLut), col("gpos") + 1) + 1).as("cl"),
          col("x"))
        .groupBy("sp", "cl", "pos")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .selectExpr("sp", "cl", "pos",
          "(2*sx + n - pmod(2*sx + n, 2*n)) div (2*n) AS c")
        .collect()
        .groupBy(_.getInt(0))
        .map { case (sp, rows) =>
          sp -> rows.groupBy(_.getInt(1)).map { case (cl, rs) =>
            cl -> rs.sortBy(_.getInt(2)).map(_.getLong(3)).toArray
          }
        }
      books = books.zipWithIndex.map { case (old, i) =>
        val up = updated.getOrElse(i, Map.empty[Int, Array[Long]])
        old.zipWithIndex.map { case (oldC, ci) => up.getOrElse(ci + 1, oldC) }
      }
    }
    books
  }

  /** Cluster-BALANCED subsampling: run [[kmeansAssign]], then keep an
    * (approximately) equal number of vectors from every cluster —
    * the diversity-curation move that stops one dominant topic from
    * owning the kept corpus the way a flat `hashSample` would let it.
    *
    * Selection is the zero-shuffle THRESHOLD discipline of
    * [[Sampling.temperatureSampleFast]]: per-cluster target
    * m = floor(keepRatio·N/k + 0.5), acceptance fraction
    * min(1, m/n_c) quantized to the 1e-9 grid, kept iff the row's
    * 48-bit md5-prefix coordinate clears floor(2⁴⁸·q_c/10⁹) — every
    * step exact integer math or one correctly-rounded IEEE chain, so
    * the oracle redraws the identical sample. A cluster smaller than
    * its share keeps everything (fraction caps at 1 ⇒ threshold 2⁴⁸).
    *
    * Scale shape: the k-means passes (per-round scans, broadcast-
    * literal argmin), then ONE k-row aggregate for cluster sizes,
    * a broadcast join of the k-row threshold frame, and a narrow
    * filter — the corpus is never shuffled by the selection. */
  def clusterBalancedSample(emb: DataFrame, k: Int, rounds: Int,
      keepRatio: Double, salt: String = "s0"): DataFrame = {
    require(keepRatio > 0 && keepRatio <= 1, s"keepRatio $keepRatio out of (0,1]")
    val assign = kmeansAssign(emb, k, rounds)
    val sizes = assign.groupBy("cluster").agg(count(lit(1)).as("__n"))
    val total = sizes.agg(sum("__n").as("__tot"))
    val thr = sizes.crossJoin(broadcast(total))
      .select(col("cluster"),
        floor(lit(keepRatio) * col("__tot").cast("double") / k + lit(0.5))
          .cast("long").as("__m"), col("__n"))
      .select(col("cluster"),
        floor(lit(281474976710656.0) *
          floor(lit(1000000000.0) *
            least(lit(1.0), col("__m").cast("double") / col("__n").cast("double"))
            + lit(0.5)).cast("double") / lit(1000000000.0))
          .cast("long").as("__thr"))
    val u = conv(substring(
      md5(concat(col("vec_id").cast("string"), lit(":" + salt)).cast("binary")),
      1, 12), 16, 10).cast("long")
    assign.join(broadcast(thr), Seq("cluster"))
      .filter(u < col("__thr"))
      .select(col("vec_id"), col("cluster"))
      .orderBy("vec_id")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Connected components over an undirected edge list — the clustering
  * step of semantic dedup: near-dup PAIRS (from exact, LSH, MinHash or
  * SimHash candidates) become CLUSTERS, and one representative per
  * cluster survives.
  *
  * Algorithm: min-label propagation to a fixpoint. Every node starts
  * labeled with itself; each round takes the min of its own and its
  * neighbors' labels. Labels are monotonically non-increasing and bounded
  * by the component minimum, so the fixpoint is exactly "label = min
  * node id reachable" — a canonical, order-independent cluster id that a
  * recursive-SQL oracle reproduces row-for-row.
  *
  * Scale shape: each round is one join on the (pre-partitioned, persisted)
  * symmetric edge list + one min-aggregate — all partial+final, no
  * driver-side data. The driver only runs the convergence loop (one
  * count per round, O(graph diameter) rounds; near-dup components are
  * shallow). Lineage is cut every round with [[Checkpointing.cut]] so
  * plans stay O(1) deep instead of O(rounds) — executor-local blocks
  * under local[·], reliable object-store checkpoints when
  * `spark.graft.checkpointDir` is set (the 100 TB fault-tolerance
  * switch; SCALE.md "Iterative checkpointing"). The classic
  * large-star/small-star alternative (Kiveris et al., "Connected
  * Components in MapReduce") is [[connectedComponentsStars]] below:
  * its contraction rounds track O(log n) rather than diameter, so it
  * wins on deep (chain-like) components, while propagation with
  * pointer jumping stays faster on the shallow graphs near-dup
  * actually produces (both measured; BASELINE.md round 4).
  */
object Components {

  /** Rounds executed by the most recent [[connectedComponents]] call on
    * this thread — diagnostic only (benchmarking/round-count audits).
    * 0 = the driver union-find fast path ran (no distributed rounds). */
  val lastRounds = new ThreadLocal[Int]

  /** Edge-count threshold at or under which [[connectedComponents]]
    * finishes with a driver-side union-find instead of the distributed
    * loop. Iterative CC pays a fixed scheduler round-trip per round
    * (~0.5 s each at any scale); a verified near-dup pair graph is
    * usually TINY relative to the corpus it came from (pairs are the
    * rare case dedup exists to find), so at 100 TB the pair frame very
    * often still fits this bound. 2²⁰ edges ≈ 16 MB of (long, long) on
    * the driver — the same bounded-collect budget as the BPE word table
    * and the IVF centroid frame; past it, the checkpoint-per-round loop
    * below takes over unchanged. */
  val defaultMaxDriverEdges: Long = 1L << 20

  /** (node, cluster_id = min reachable node id) for every node that
    * appears in `edges` (columns `a_id`, `b_id`). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50,
      maxDriverEdges: Long = defaultMaxDriverEdges): DataFrame = {
    // Materialize the incoming pair frame ONCE before symmetrizing: the
    // union reads it twice, and without this the whole upstream pipeline
    // (e.g. the banded-LSH candidate join feeding dedup_semantic_lsh)
    // executes twice inside the first action — measured as the dominant
    // share of that query's cost and variance. The edge count rides the
    // checkpoint job as an observe metric (no second action) and routes
    // tiny graphs to the union-find finisher.
    val cntObs = new org.apache.spark.sql.Observation()
    val base = edges.select(col("a_id").as("src"), col("b_id").as("dst"))
      .observe(cntObs, count(lit(1)).as("n"))
      .pipe(Checkpointing.cut)
    val nEdges = cntObs.get("n").asInstanceOf[Long]
    if (nEdges <= maxDriverEdges) {
      lastRounds.set(0)
      return driverUnionFind(base)
    }
    val sym = Dist.byKeys(
      base.union(base.select(col("dst").as("src"), col("src").as("dst"))),
      col("dst")) // join side below keys on dst
      .persist()
    // Init fuses round 0 into the node-set build: label = min(self, all
    // neighbors) — the same groupBy shuffle a distinct() would pay, but
    // the first propagation comes free (one fewer 2-join round below).
    var labels = sym.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("node"), least(col("node"), col("nmin")).as("label"))
      .pipe(Checkpointing.cut)
    // CONTRACTION FINISHER: one relabel pass maps every raw edge into
    // label space — the QUOTIENT graph. Connectivity is preserved (every
    // node is adjacent to its own label by construction: label(u) ∈ {u} ∪
    // N(u), so contracting u onto label(u) never disconnects anything),
    // and near-dup CLUSTERS collapse to self-loops, so a dup-heavy pair
    // graph's quotient is typically orders of magnitude smaller than the
    // raw graph even when the raw graph exceeds the driver bound. If the
    // quotient fits the SAME bounded-collect budget, finish with the
    // driver union-find: quotient cluster ids are true component minima
    // (the component min m has label(m) = m, so m survives contraction
    // as its own quotient node), and label∘quotientCluster is exactly
    // the distributed loop's fixpoint — one distributed round + one
    // bounded collect instead of O(diameter) scheduler round-trips.
    // (The current fixtures' pair graphs all sit under the raw bound and
    // take the direct union-find path above — ComponentsSpec forces this
    // tier explicitly; at 100 TB it is the common case for a dup-heavy
    // corpus whose raw pair list overflows the bound.)
    val qObs = new org.apache.spark.sql.Observation()
    val lu = labels.select(col("node").as("__u"), col("label").as("__lu"))
    val lv = labels.select(col("node").as("__v"), col("label").as("__lv"))
    val quotient = base
      .join(lu, base("src") === col("__u"))
      .join(lv, base("dst") === col("__v"))
      .select(col("__lu").as("src"), col("__lv").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .observe(qObs, count(lit(1)).as("n"))
      .pipe(Checkpointing.cut)
    if (qObs.get("n").asInstanceOf[Long] <= maxDriverEdges) {
      lastRounds.set(1)
      val qcc = driverUnionFind(quotient).withColumnRenamed("node", "label")
      val out = labels
        .join(qcc, Seq("label"), "left") // labels absent from the quotient are final
        .select(col("node"), coalesce(col("cluster_id"), col("label")).as("cluster_id"))
        .pipe(Checkpointing.cut) // materialize before sym.unpersist
      sym.unpersist()
      return out
    }
    var round = 0
    var prevFp = (-1L, -1L)
    while (round < maxIter) {
      // One round = ONE aggregation over the union of three label sources:
      //   - the node's own label,
      //   - every neighbor's label (edge propagation),
      //   - the label OF the node's current label (pointer jumping — so
      //     components collapse in O(log diameter) rounds, not O(diameter)).
      // Folding propagate + jump into a single groupBy(min) does the work
      // of the previous neighborMin/adopt/ptr-jump join chain in two joins
      // + one aggregate; `labels` is checkpointed, so reading it three
      // times is a cache scan, not recompute. (The jump uses the
      // pre-propagation labels — per-round slightly weaker than jumping on
      // the propagated ones, same monotone fixpoint, same round count on
      // shallow near-dup graphs.)
      val byNode = labels.select(col("node").as("src"), col("label"))
      val viaEdge = sym.join(labels, sym("dst") === labels("node"))
        .select(col("src"), col("label"))
      val viaJump = labels.as("a")
        .join(labels.as("b"), col("a.label") === col("b.node"))
        .select(col("a.node").as("src"), col("b.label").as("label"))
      // (A second jump hop — label of label of label — was tried and does
      // NOT reduce rounds on the fixture pair graphs: measured 7/8 rounds
      // either way at sf0.1, because the round count is limited by min-label
      // flow across EDGES, not by label-chain length. Kept single-hop.)
      // labels are monotonically non-increasing, so the label multiset
      // changes every round until the fixpoint. Convergence is detected by
      // the same order-independent, overflow-proof fingerprint as the
      // stars variant: (row count, XOR of xxhash64(node, label)) — XOR is
      // commutative/associative and, unlike sum(label), cannot overflow
      // under ANSI on huge graphs. It rides the CHECKPOINT job as an
      // `observe` metric instead of a second aggregate action — one job
      // per round, not two (the bench wobble of the CC rows at toy SF is
      // larger than the saved job, but at scale one fewer action per round
      // is one fewer full scheduler round-trip).
      val obs = new org.apache.spark.sql.Observation(s"cc_round_$round")
      val next = byNode.unionAll(viaEdge).unionAll(viaJump)
        .groupBy(col("src")).agg(min("label").as("label"))
        .select(col("src").as("node"), col("label"))
        .observe(obs, count(lit(1)).as("n"),
          expr("bit_xor(xxhash64(node, label))").as("h"))
        .pipe(Checkpointing.cut) // eager: cut lineage, one O(1)-deep plan per round
      val cur = (obs.get("n").asInstanceOf[Long], obs.get("h").asInstanceOf[Long])
      labels = next
      round += 1
      lastRounds.set(round)
      if (cur == prevFp) round = maxIter
      prevFp = cur
    }
    sym.unpersist()
    labels.select(col("node"), col("label").as("cluster_id"))
  }

  /** Bounded-collect finisher for small pair graphs: classic union-find
    * (path halving + union-by-min, so the root IS the component minimum)
    * over the already-materialized edge frame. One collect replaces
    * O(rounds) scheduler round-trips; the result comes back as a
    * LocalRelation, so the downstream representative join broadcasts
    * without a shuffle. Only reachable under [[defaultMaxDriverEdges]]
    * (≤ ~16 MB collected); output contract and values are identical to
    * the distributed loop (property-asserted in ComponentsSpec). */
  private def driverUnionFind(base: DataFrame): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val idType = base.schema("src").dataType
    val edges = base.select(col("src").cast("long"), col("dst").cast("long"))
      .collect()
    val parent = scala.collection.mutable.LongMap.empty[Long]
    val nodes = scala.collection.mutable.LongMap.empty[Unit]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrElse(p, p)
        parent.update(x, gp)
        x = gp
        p = parent.getOrElse(x, x)
      }
      x
    }
    edges.foreach { r =>
      val a = r.getLong(0); val b = r.getLong(1)
      nodes.update(a, ()); nodes.update(b, ())
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent.update(rb, ra)
      else if (rb < ra) parent.update(ra, rb)
    }
    nodes.keysIterator.map(n => (n, find(n))).toSeq
      .toDF("node", "cluster_id")
      .select(col("node").cast(idType).as("node"),
        col("cluster_id").cast(idType).as("cluster_id"))
  }

  /** Semantic dedup summary: cluster every node of the near-dup pair
    * graph and keep the min-id representative (= the cluster id). */
  def semanticDedup(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .select(col("node").as("vec_id"), col("cluster_id"))

  /** INCREMENTAL connected components — apply a DELTA edge batch to a
    * stored (node, cluster_id) assignment without re-reading base
    * edges: the graph-side sibling of `rollup_incremental` /
    * `scd2_incremental`'s algebraic IVM (round 10). The stored state is
    * compressed to STAR edges (cluster_id → member) — for min-id
    * labels the star graph has the same components as the base edge
    * set — and one [[connectedComponents]] run over stars ∪ delta
    * re-labels everything the delta can reach. Because cluster_id IS a
    * member node id (the minimum), merged components recover the
    * correct global minimum.
    *
    * The result is IDENTICAL to a full recompute over base ∪ delta
    * edges (gated as `graph_cc_incremental`: the oracle IS the full
    * recompute — the IVM identity, §7.4).
    *
    * Scale shape (100 TB): each refresh touches O(|nodes| + |delta|)
    * star/delta edges — the base EDGE SET (the corpus-sized object: at
    * web scale |E| ≫ |V|) is never re-read; the CC loop itself runs on
    * the compressed graph whose diameter is ≤ 2 + delta-path length,
    * so the propagation converges in a handful of rounds regardless of
    * the original graph's diameter. */
  def ccApplyDelta(state: DataFrame, deltaEdges: DataFrame): DataFrame = {
    val stars = state.filter(col("node") =!= col("cluster_id"))
      .select(col("cluster_id").as("a_id"), col("node").as("b_id"))
    val merged = connectedComponents(
      stars.unionAll(deltaEdges.select(col("a_id"), col("b_id"))))
    // singleton components (node == cluster_id) contribute no star edge
    // and must survive untouched unless the delta reaches them
    val allNodes = state.select(col("node"))
      .unionAll(deltaEdges.select(col("a_id").as("node")))
      .unionAll(deltaEdges.select(col("b_id").as("node")))
      .distinct()
    allNodes.join(merged, Seq("node"), "left_outer")
      .select(col("node"),
        coalesce(col("cluster_id"), col("node")).as("cluster_id"))
  }

  /** Connected components by ALTERNATING STAR CONTRACTION (Kiveris et
    * al., "Connected Components in MapReduce and Beyond" — the
    * large-star/small-star algorithm): instead of propagating labels
    * across a FIXED edge list (rounds = graph diameter for min-label
    * flow), each round REWRITES the edges themselves —
    *
    *  - large-star: every node's strictly-larger neighbors are
    *    re-attached to its minimum neighbor (incl. itself);
    *  - small-star: every node and its smaller neighbors are re-attached
    *    to the smallest of them —
    *
    * so components contract toward stars centered at their minimum and
    * the edge list SHRINKS as it flattens. Same output contract as
    * [[connectedComponents]] (node → min reachable id); equality is
    * asserted on fixtures and generated graphs (ComponentsSpec).
    *
    * Scale shape per round: one groupBy(min) + one join on the current
    * edge frame + distinct, all partial+final; the frame is
    * checkpointed eagerly (O(1) plan depth) and only a (count, sum)
    * fingerprint crosses the driver per round (observe metrics on the
    * checkpoint job). Preferable to label propagation when components
    * are DEEP (chains): rounds track O(log n) contraction, not
    * diameter. On the fixture near-dup graphs (diameter ≈ 7) both run
    * in the same ~7 rounds at roughly equal cost — measured; kept as
    * the documented alternative for adversarial-depth graphs rather
    * than the default. */
  def connectedComponentsStars(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // One upstream execution (see connectedComponents): allNodes and the
    // initial edge frame both read the pair source, so materialize it
    // first or the candidate pipeline runs twice.
    val base = edges.select(col("a_id").as("u"), col("b_id").as("v"))
      .pipe(Checkpointing.cut)
    val allNodes = base.select(col("u").as("node"))
      .unionAll(base.select(col("v").as("node"))).distinct()
      .pipe(Checkpointing.cut)
    // One large-star + small-star contraction, lazily composed. Both
    // stars are SINGLE-PASS WINDOW forms: the per-neighborhood minimum
    // rides a full-frame window over the attachment key instead of a
    // groupBy + self-join, so each star reads its input exactly once —
    // no inner materialization (the former small-star checkpoint was 2
    // eager actions per round; this is 1) and no join exchanges. The
    // small-star emits both outputs (neighbors→min, center→min) in the
    // same pass via a row_number-guarded explode; duplicate edges out
    // of large-star are harmless under min/row_number and are swept by
    // the final distinct, so large-star needs no distinct of its own.
    def contract(e0: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val wFull = Window.partitionBy("u").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      // large-star: strictly-larger neighbors attach to min(nbhd ∪ self)
      val sym = e0.select(col("u"), col("v"))
        .unionAll(e0.select(col("v").as("u"), col("u").as("v")))
      val ls = sym.withColumn("m", least(col("u"), min("v").over(wFull)))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      // small-star (edges directed big -> small): the center and its
      // smaller neighbors all attach to the smallest of them
      val dir = ls.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      dir.withColumn("m", min("v").over(wFull))
        .withColumn("rn", row_number().over(Window.partitionBy("u").orderBy("v")))
        .select(explode(when(col("rn") === 1, array(col("v"), col("u")))
          .otherwise(array(col("v")))).as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    var e = base.filter(col("u") =!= col("v")).distinct().pipe(Checkpointing.cut)
    var round = 0
    var prev = (-1L, -1L)
    while (round < maxIter) {
      // ONE contraction per checkpointed action. (Pairing two
      // contractions between checkpoints was tried and is a measured
      // 3× REGRESSION: a contraction references its input ~4 times —
      // sym union, groupBy, join — so without a materialization between
      // them the first contraction re-executes per reference and the
      // recompute fans out multiplicatively. The checkpoint is what
      // makes each round O(1) work.)
      val obs = new org.apache.spark.sql.Observation(s"cc_stars_$round")
      val ss = contract(e)
        // fingerprint = (count, XOR of xxhash64(u,v)): order-independent
        // and collision-resistant (and unlike sum, cannot overflow under
        // ANSI), so "unchanged fingerprint" ⇒ fixpoint
        .observe(obs, count(lit(1)).as("n"),
          expr("bit_xor(xxhash64(u, v))").as("h"))
        .pipe(Checkpointing.cut)
      e = ss
      round += 1
      lastRounds.set(round)
      val cur = (obs.get("n").asInstanceOf[Long], obs.get("h").asInstanceOf[Long])
      if (cur == prev) round = maxIter
      prev = cur
    }
    // converged: e is (node -> component min) for every non-root node
    allNodes.join(e.select(col("u").as("node"), col("v").as("label")),
        Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("label"), col("node")).as("cluster_id"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Iterative graph traversal — the capability SQL expresses with
  * `WITH RECURSIVE` and Spark has no built-in for: breadth-first
  * shortest-hop distances over an edge list, by frontier expansion.
  *
  * Scale shape (the same discipline as [[Components]]): the edge list is
  * partitioned on the join key and persisted once; each round joins the
  * CURRENT FRONTIER (shrinks toward the fringe) against it, anti-joins
  * the visited set to keep only newly reached nodes, and checkpoints
  * eagerly so plans stay O(1) deep. The driver sees one observe-metric
  * fingerprint per round, never rows. Rounds = min(graph eccentricity
  * from the seed, maxDepth); each round's shuffles carry (node, dist)
  * pairs only.
  *
  * ONE hop per round is deliberate (round-8 measurement): a two-hop
  * variant — both depths fused into one checkpointed action, hop-2
  * anti-joining visited ∪ hop-1 — was implemented and measured
  * consistently SLOWER at every SF (two-hop 1.08–1.19/1.36–1.69/
  * 4.20–4.29 s vs one-hop 0.86–0.99/1.25–1.33/3.27–3.41 s at
  * sf0.001/0.01/0.1), with or without persisting the hop-1 frame: the
  * per-round fixed cost is per SHUFFLE STAGE, not per action, and the
  * fused round serializes the same stages while adding a union and a
  * wider anti-join. SCALE.md "graph_bfs two-hop experiment" records
  * the numbers.
  */
object Graph {

  /** Min hop distance from `seed` to every node reachable within
    * `maxDepth` hops over DIRECTED edges (`src`, `dst`). Returns
    * (node, dist) including (seed, 0). Undirected graphs pass a
    * symmetrized edge list. `maxDepth` bounds the loop on BOTH engines
    * (the DuckDB oracle caps its recursive CTE identically), so results
    * are well-defined even on cyclic graphs. */
  def bfs(edges: DataFrame, seed: Long, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0)
    val spark = edges.sparkSession
    import spark.implicits._
    val e = Dist.byKeys(edges.select(col("src"), col("dst")), col("src")).persist()
    var visited = Seq((seed, 0)).toDF("node", "dist").pipe(Checkpointing.cut)
    var frontier = visited
    var depth = 0
    var done = false
    while (depth < maxDepth && !done) {
      val obs = new org.apache.spark.sql.Observation(s"bfs_$depth")
      // dist rides as a COLUMN (frontier dist + 1), not a per-round
      // literal: a lit(depth+1) is constant-folded into the generated
      // code, so every round would compile a fresh whole-stage-codegen
      // plan; the column form keeps round plans structurally identical
      // and the codegen cache hot (measured: shaves the per-round
      // compile share of the fixed floor)
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node"), (frontier("dist") + lit(1)).as("dist"))
        .distinct()
        .join(visited, Seq("node"), "left_anti")
        .observe(obs, count(lit(1)).as("n"))
        .pipe(Checkpointing.cut)
      done = obs.get("n").asInstanceOf[Long] == 0
      if (!done) {
        // no checkpoint on visited: it's a union of ≤ maxDepth frames that
        // are EACH checkpointed, so the plan stays shallow and re-reading
        // it is a cache scan (round time is dominated by the
        // join/distinct/anti-join jobs either way — the same ~0.5 s/round
        // toy-SF floor as the CC loop, amortizing with data size)
        visited = visited.unionAll(next)
        frontier = next
      }
      depth += 1
    }
    e.unpersist()
    visited
  }

  /** PageRank by power iteration over DIRECTED edges (`src`, `dst`) —
    * the web-graph quality signal pretraining pipelines rank crawl
    * sources with. A fixed iteration count (not a convergence test)
    * keeps the result a deterministic function of the input so a plain
    * SQL oracle can recompute it by unrolling the same rounds.
    *
    * Per round: rank(v) ← (1−d)/N + d·Σ_{u→v} rank(u)/outdeg(u).
    * Dangling mass (nodes with no out-edges) is dropped, identically on
    * both engines; callers wanting mass conservation symmetrize or add
    * self-loops upstream.
    *
    * Scale shape (same discipline as [[bfs]]/[[Components]]): the
    * degree-annotated edge list is partitioned on `src` and persisted
    * ONCE; each round joins the current rank frame against it, shuffles
    * (dst, contribution) pairs only — never edges, never text — and
    * checkpoints the |V|-row rank frame so plans stay O(1) deep.
    * Ranks are rounded ([[graft.functions.Num.r8]] — 1e-8; the r4 grid
    * zeroes O(1/N) ranks past ~10⁴ nodes) each round, which
    * both pins cross-engine agreement (the next round's input is
    * bit-identical on both sides) and stops float-association noise
    * accumulating across rounds. */
  def pagerank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      checkpointEvery: Int = 0): DataFrame = {
    import graft.functions.Num.r8
    require(iters >= 0)
    val e = edges.select(col("src"), col("dst")).distinct()
    // Setup is TWO eager materializations, not four (round-9: the iters=0
    // probe showed setup at ~60% of the toy-SF total, dominated by
    // per-job scheduling floors; interleaved A/B read 5.4 s vs 7.5 s at
    // sf0.1 for the four-checkpoint form):
    //  1. `ed` — the degree-annotated, src-partitioned edge list every
    //     round joins (localCheckpoint(true): blocks reclaimed by the
    //     ContextCleaner when the frame is GC'd, unlike persist()).
    //  2. `nodes` — derived FROM ed's cached blocks (the inner degree
    //     join preserves every edge row, so ed's endpoint set ≡ e's),
    //     with the has-inbound flag folded INTO the same endpoint
    //     aggregate: the old separate noRecv anti-join checkpoint — and
    //     the tempting lazy alternative, which turned out to re-plan a
    //     full |E| dst-distinct EVERY round (per-round expression ids
    //     defeat exchange reuse) — both collapse into a per-round
    //     NARROW FILTER over these cached blocks.
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ed = Dist.byKeysCut(e.join(outdeg, "src"), "src")
    // |V| rides the checkpoint job as an observe metric (round 15) —
    // the old separate nodes.count() action was one more full scheduler
    // round-trip for a scalar the same job already knows
    val nObs = new org.apache.spark.sql.Observation()
    val nodes = ed.select(col("src").as("node"), lit(false).as("recv"))
      .unionAll(ed.select(col("dst").as("node"), lit(true).as("recv")))
      .groupBy("node").agg(bool_or(col("recv")).as("recv"))
      .observe(nObs, count(lit(1)).as("n"),
        count(when(!col("recv"), lit(1))).as("n_norecv"))
      .localCheckpoint(true)
    val n = nObs.get("n").asInstanceOf[Long]
    // |noRecv| rides the same cut: a SYMMETRIZED graph (every query's
    // shape, and the common production one) has NO no-inbound nodes, and
    // knowing that on the driver lets the loop skip the noRecv machinery
    // entirely — see below (round 16)
    val hasNoRecv = nObs.get("n_norecv").asInstanceOf[Long] > 0L
    var ranks = nodes.select(col("node"), r8(lit(1.0) / lit(n.toDouble)).as("rank"))
    val base = lit(1.0 - damping) / lit(n.toDouble)
    // Nodes with NO in-edges never receive contributions — their rank is
    // the constant base from round 1 on, so their per-round
    // out-contributions are a CONSTANT frame. Round 16 reshapes the old
    // per-round rank-row union two ways:
    //  - the constant contributions union BELOW the exchange (into the
    //    aggregate input — the katz round-15 move), so the loop-carried
    //    frame stays a pure aggregate output: hashpartitioned on `node`,
    //    co-partitioned with the src-keyed edge checkpoint. The old
    //    rank-row union destroyed that partitioning — invisible at toy
    //    SFs where AQE broadcast-converts the join, but at the ~sf1
    //    synth slice the SMJ re-exchanged the rank frame every round.
    //    sum(s ∪ consts) ≡ sum(s) + consts exactly in LONG and the
    //    constant rows carry the identical floor(r8(base)·1e8/outdeg
    //    + 0.5) quantization, so results are bit-identical; the
    //    no-inbound rank ROWS re-join the output once after the loop.
    //  - when the observed |noRecv| is ZERO the union is the identity,
    //    so the loop skips it (and the final row union) outright — no
    //    per-round empty-frame join/broadcast stages at all.
    val noRecv = nodes.filter(!col("recv")).select(col("node"), r8(base).as("rank"))
    def quantized(r: DataFrame): DataFrame =
      r.join(ed, r("node") === ed("src"))
        .select(col("dst").as("node"),
          floor(col("rank") * lit(100000000L) / col("outdeg") + lit(0.5)).cast("long").as("wq"))
    val noRecvContrib = quantized(noRecv)
    for (i <- 1 to iters) {
      // Contributions are quantized to the 1e-8 grid BEFORE the sum and
      // summed as LONGs (ADVICE r8): long addition is associative and
      // commutative, so the per-node total is bit-identical under ANY
      // partition count or merge order — a double sum's accumulation
      // order differs between Spark partial aggregation and a
      // single-threaded oracle, and a total landing within an ulp of a
      // rounding boundary would flip the r8 grid step and cascade
      // through later rounds. The oracle applies the identical
      // floor(rank·1e8/outdeg + 0.5) before ITS sum.
      // Round 1's input is the FULL initial frame (every node at 1/N);
      // later rounds carry the aggregate output (nodes WITH in-edges)
      // plus the constant no-inbound contributions.
      val fromRanks = quantized(ranks)
      val contrib = (if (i == 1 || !hasNoRecv) fromRanks
        else fromRanks.unionAll(noRecvContrib))
        .groupBy("node").agg(sum(col("wq")).as("wq"))
      ranks = contrib
        .select(col("node"),
          r8(base + lit(damping) * (col("wq").cast("double") / lit(100000000.0))).as("rank"))
      // Unlike the while-driven BFS/CC loops, a FIXED small round count
      // needs no per-round action at all: left lazy, the rounds compose
      // into ONE DAG — AQE plans every stage, nothing materializes
      // per-round, and the scheduler floor is paid once (measured at
      // sf0.1 warm: 5-7 s eager-per-round → ~4.5 s lazy-with-left-join
      // → the union form plans exactly one exchange per round plus the
      // output sort — 7 total for 6 rounds). `checkpointEvery`
      // (default off) restores the cut for LONG loops — a 50-round run
      // on a 1000-executor cluster wants bounded plans and restartable
      // state more than single-DAG scheduling.
      if (checkpointEvery > 0 && i % checkpointEvery == 0)
        ranks = Checkpointing.cut(ranks)
    }
    if (iters >= 1 && hasNoRecv) ranks.unionAll(noRecv) else ranks
  }

  /** Personalized PageRank — random walk with restart to a SEED set
    * (Haveliwala 2002; the similar-item / trust-propagation workhorse):
    * identical discipline to [[pagerank]] (degree-annotated checkpointed
    * edge list, contributions LONG-quantized on the 1e-8 grid BEFORE the
    * sum, one r8-gridded IEEE division per round), but the teleport mass
    * lands only on `seeds` — (1−d)/|S| each — so ranks measure proximity
    * TO the seeds instead of global centrality. Non-seed nodes with no
    * in-edges sit at exactly 0.0; seeds should be graph nodes (a seed
    * absent from the edge set contributes no mass — caller's contract).
    * The seed test rides every round as a broadcast `isin` literal —
    * no extra join, no extra exchange vs [[pagerank]]. */
  def personalizedPagerank(edges: DataFrame, seeds: Seq[Long], iters: Int,
      damping: Double = 0.85, checkpointEvery: Int = 0): DataFrame = {
    import graft.functions.Num.r8
    require(iters >= 0 && seeds.nonEmpty)
    val e = edges.select(col("src"), col("dst")).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ed = Dist.byKeysCut(e.join(outdeg, "src"), "src")
    val nrObs = new org.apache.spark.sql.Observation()
    val nodes = ed.select(col("src").as("node"), lit(false).as("recv"))
      .unionAll(ed.select(col("dst").as("node"), lit(true).as("recv")))
      .groupBy("node").agg(bool_or(col("recv")).as("recv"))
      .observe(nrObs, count(lit(1)).as("n"),
        count(when(!col("recv"), lit(1))).as("n_norecv"))
      .localCheckpoint(true)
    val hasNoRecv = nrObs.get("n_norecv").asInstanceOf[Long] > 0L
    val isSeed = col("node").isin(seeds: _*)
    val base = lit(1.0 - damping) / lit(seeds.size.toDouble)
    var ranks = nodes.select(col("node"),
      when(isSeed, r8(lit(1.0) / lit(seeds.size.toDouble)))
        .otherwise(lit(0.0)).as("rank"))
    val noRecv = nodes.filter(!col("recv")).select(col("node"),
      when(isSeed, r8(base)).otherwise(lit(0.0)).as("rank"))
    def quantized(r: DataFrame): DataFrame =
      r.join(ed, r("node") === ed("src"))
        .select(col("dst").as("node"),
          floor(col("rank") * lit(100000000L) / col("outdeg") + lit(0.5)).cast("long").as("wq"))
    // same co-partitioning move as [[pagerank]] (round 16): no-inbound
    // nodes hold a constant rank from round 2 on (r8(base) for seeds,
    // exactly 0.0 otherwise — a 0.0 source quantizes to wq = 0, kept so
    // the summed row sets match the old form exactly), so their
    // contributions union BELOW the exchange and the loop-carried frame
    // stays a pure aggregate output, co-partitioned with the edge list;
    // a symmetrized graph observes |noRecv| = 0 and skips the machinery.
    val noRecvContrib = quantized(noRecv)
    for (i <- 1 to iters) {
      val fromRanks = quantized(ranks)
      val contrib = (if (i == 1 || !hasNoRecv) fromRanks
        else fromRanks.unionAll(noRecvContrib))
        .groupBy("node").agg(sum(col("wq")).as("wq"))
      ranks = contrib
        .select(col("node"),
          r8(when(isSeed, base).otherwise(lit(0.0)) +
            lit(damping) * (col("wq").cast("double") / lit(100000000.0))).as("rank"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0)
        ranks = Checkpointing.cut(ranks)
    }
    if (iters >= 1 && hasNoRecv) ranks.unionAll(noRecv) else ranks
  }

  /** Katz centrality (Katz 1953) with a DYADIC attenuation factor —
    * x_i(v) = 1 + α·Σ_{j→v} x_{i−1}(j), α = 1/attenuationDiv — run a
    * fixed round count in 1e8 micro-units: the per-round update is
    * `1e8 + (Σ incoming) div attenuationDiv`, pure BIGINT floor
    * division, so there is NO floating-point operation anywhere in the
    * chain (stronger even than pagerank's one r8 division per round).
    * Counts walks of all lengths attenuated by α^len — the centrality
    * that sees beyond the 1-hop degree without pagerank's stochastic
    * normalization. Convergence/overflow contract: α·maxInDegree < 1
    * keeps values bounded (fixture supplier degree ~24 ≪ 64); values ≤
    * 1e8/(1−α·d) fit LONG by orders of magnitude.
    *
    * Scale shape: [[pagerank]]'s discipline — src-partitioned
    * checkpointed edge list, one exchange per round shipping (node,
    * LONG) pairs, lazy single-DAG for small fixed round counts. Nodes
    * without in-edges are kept by UNIONING a zero-contribution row per
    * node INTO the per-round sum (round 15) instead of a per-round
    * |V|⋈|V| left-outer join: sum(s ∪ {0}) ≡ coalesce(sum(s), 0)
    * exactly (LONG addition), the |V| extra rows ride the same
    * exchange, and the old join was planning as a SortMergeJoin — one
    * exchange plus three sorts per round gone. */
  def katzCentrality(edges: DataFrame, iters: Int,
      attenuationDiv: Long = 64L, checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 0 && attenuationDiv >= 2)
    val e = edges.select(col("src"), col("dst")).distinct()
    val ed = Dist.byKeysCut(e, "src")
    val nodes = ed.select(col("src").as("node"))
      .unionAll(ed.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val unit = lit(100000000L)
    val zeroes = nodes.select(col("node"), lit(0L).as("katz_u"))
    var x = nodes.select(col("node"), unit.as("katz_u"))
    for (i <- 1 to iters) {
      x = x.join(ed, x("node") === ed("src"))
        .select(col("dst").as("node"), col("katz_u"))
        .unionAll(zeroes)
        .groupBy("node").agg(sum(col("katz_u")).as("s"))
        .select(col("node"),
          (unit + expr(s"CAST(s DIV $attenuationDiv AS BIGINT)")).as("katz_u"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0)
        x = Checkpointing.cut(x)
    }
    x.select(col("node"), col("katz_u"),
      graft.functions.Num.r8(col("katz_u").cast("double") / lit(100000000.0)).as("katz"))
  }

  /** Synchronous label propagation over DIRECTED edges (`src`, `dst`) —
    * the classic community-detection primitive (Raghavan et al. 2007):
    * every node starts labeled with its own id; each round it adopts the
    * label most frequent among its in-neighbors, ties broken toward the
    * SMALLEST label. A fixed round count plus the deterministic
    * tie-break makes the result a pure integer function of the edge
    * list, so a plain SQL oracle unrolls the identical rounds as CTEs
    * (synchronous LPA can oscillate on bipartite graphs — a property of
    * the algorithm, identical on both engines, bounded by the fixed
    * rounds). Undirected graphs pass a symmetrized edge list, which also
    * guarantees every node receives votes each round.
    *
    * Scale shape (the [[pagerank]] discipline): the edge list is
    * src-partitioned and checkpointed ONCE; each round joins the |V|-row
    * label frame against it and shuffles (node, label) pairs only —
    * never edges twice. ONE exchange per round (round 15): the vote
    * pairs are hash-distributed by `node` alone — HashPartitioning(node)
    * satisfies the clustered distribution of BOTH downstream aggregates
    * (every (node, label) group lives in node's partition), so the
    * per-(node, label) count and the per-node argmax run back to back in
    * the same stage where the old groupBy(node, label) → groupBy(node)
    * chain paid two exchanges. The argmax itself is a plain LONG max
    * over the order-embedding cnt·idBound + (idBound−1−label) — highest
    * count, then smallest label — instead of max(struct(cnt, −label)):
    * struct max is not hash-aggregable and was planning as a
    * SortAggregate pair with three per-round sorts; the long form keeps
    * every round in whole-stage-codegen HashAggregates with zero sorts.
    * `idBound` caps node ids so the embedding is exact (same declared
    * contract as [[triangleCounts]]'s nodeIdBound; cnt·idBound must fit
    * a LONG — at the default 2³¹ that allows 4.3·10⁹ same-label
    * in-votes per node). Rounds stay lazy in one DAG; `checkpointEvery`
    * restores the cut for long loops. */
  def labelPropagation(edges: DataFrame, iters: Int,
      checkpointEvery: Int = 0, idBound: Long = 1L << 31): DataFrame = {
    require(iters >= 1)
    require(idBound >= 2, s"labelPropagation: idBound must be >= 2, got $idBound")
    val e = edges.select(col("src"), col("dst")).distinct()
    // id-range guard (ADVICE r15 medium): the argmax order-embedding
    // cnt·idBound + (idBound−1−label) is exact ONLY for ids in
    // [0, idBound) — an out-of-range id would silently decode to a wrong
    // label where the old struct-max was correct for any LONG. The check
    // rides the edge checkpoint as an observe metric (no extra job) and
    // fails LOUDLY before any result escapes. At 100 TB, synthetic keys
    // past 2³¹ must pass an explicit larger idBound (which shrinks the
    // safe per-label vote count to 2⁶³/idBound — documented contract).
    val idObs = new org.apache.spark.sql.Observation()
    val ed = Dist.byKeysCutVia(e,
      _.observe(idObs, min(least(col("src"), col("dst"))).cast("long").as("lo"),
        max(greatest(col("src"), col("dst"))).cast("long").as("hi")),
      "src")
    val idLo = idObs.get("lo")
    require(idLo == null || (idLo.asInstanceOf[Long] >= 0L &&
        idObs.get("hi").asInstanceOf[Long] < idBound),
      s"labelPropagation: node ids must lie in [0, $idBound) for the exact " +
        s"argmax order-embedding (observed [${idLo}, ${idObs.get("hi")}]); " +
        "pass a larger idBound")
    var labels = ed.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (i <- 1 to iters) {
      labels = Dist.byKeys(
          labels.join(ed, labels("node") === ed("src"))
            .select(col("dst").as("node"), col("label")),
          col("node"))
        .groupBy("node", "label").agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(max(col("cnt") * lit(idBound)
          + (lit(idBound - 1L) - col("label"))).as("m"))
        .select(col("node"),
          (lit(idBound - 1L) - pmod(col("m"), lit(idBound))).as("label"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0)
        labels = Checkpointing.cut(labels)
    }
    labels
  }

  /** Fixed-round k-core peeling over a SYMMETRIZED edge list: each round
    * drops every node whose remaining degree is < k and restricts the
    * edge set to surviving endpoints — the degeneracy filter that
    * separates cohesive cores from tendrils (spam/bot subgraphs, weakly
    * attached crawl fringes). A fixed round count (instead of
    * peel-until-stable) keeps the result a deterministic function the
    * oracle can unroll; R rounds compute the k-core exactly whenever
    * peeling stabilizes within R (each round removes ≥1 node until
    * stable, so R bounds cascade depth).
    *
    * Returns the surviving `(node, deg)` frame (degree within the final
    * subgraph). Symmetry makes per-direction src-counts equal true
    * degrees and is PRESERVED by each round's two-sided restriction.
    *
    * Scale shape: each round is ONE map-side-combined degree aggregate
    * (k-row filter output ≤ |V|) plus two semi-joins restricting the
    * edge list — shuffles carry (node) keys and edge pairs, never
    * attributes. The edge frame is hash-distributed by `src` ONCE up
    * front (round 15): HashPartitioning(src) satisfies the distinct,
    * every round's degree aggregate, and the final degree output, and
    * it survives the (runtime-broadcast) semi-joins and each round's
    * checkpoint — so the per-round degree exchange disappears and the
    * only shuffle in the whole peel is that one setup exchange. UNLIKE
    * pagerank's lazy DAG, every round's edge frame is CUT by default
    * (`checkpointEvery = 1`): the frame feeds TWO consumers per round
    * (its own degree aggregate and the next restriction), so a lazy
    * composition re-derives the whole peel prefix per consumer —
    * measured as a stall at the ~sf1 probe where the eager form is
    * seconds. Pass 0 to opt back into the lazy DAG for small fixed
    * peels. */
  def kcore(edges: DataFrame, k: Int, rounds: Int,
      checkpointEvery: Int = 1): DataFrame = {
    require(k >= 1 && rounds >= 1)
    var e = Dist.byKeys(edges.select(col("src"), col("dst")), col("src"))
      .distinct()
    for (i <- 1 to rounds) {
      val keep = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k).select("node")
      e = e.join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0)
        e = Checkpointing.cut(e)
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }

  /** Exact per-node triangle counts over an UNDIRECTED graph given as a
    * directed edge list (symmetry not required — edges are canonicalized;
    * self-loops dropped). The clustering-coefficient numerator: community
    * cohesion, spam/link-farm signals, graph-quality audits.
    *
    * Scale shape — DEGREE ORIENTATION (Schank–Wagner node-iterator++,
    * the standard distributed-triangle trick): every undirected edge is
    * oriented from its lower-(degree, id) endpoint to the higher, which
    * turns each triangle into exactly ONE (apex → a, apex → b, a → b)
    * pattern and bounds the wedge mass by Σ_v C(outdeg⁺(v), 2) with
    * outdeg⁺ ≤ O(√|E|) on any graph — the self-join never sees a high-
    * degree hub's full neighborhood square. Two equi-joins total (wedge
    * build on the apex, closure probe on (a, b)), both on the oriented
    * frame; per-node attribution explodes 3 rows per triangle, then one
    * count aggregate. `nodeIdBound` caps ids so the (deg, id) order
    * collapses into one scalar key (deg·bound + id) — a plain long
    * column both engines compare identically. */
  def triangleCounts(edges: DataFrame, nodeIdBound: Long = 1000000L): DataFrame =
    triangleCountsWithDeg(edges, nodeIdBound).select(col("node"), col("n_tri"))

  /** [[triangleCounts]] plus each node's undirected degree — the shared
    * core for the per-node count query and [[clusteringCoeff]]. Output
    * (node, deg, n_tri). */
  def triangleCountsWithDeg(edges: DataFrame,
      nodeIdBound: Long = 1000000L): DataFrame = {
    require(nodeIdBound >= 1,
      s"triangleCounts: nodeIdBound must be >= 1, got $nodeIdBound")
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = und.select(col("u").as("node")).unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .select(col("node"), col("deg"),
        (col("deg") * nodeIdBound + col("node")).as("ok"))
    // id-range guard (ADVICE r15 / VERDICT r15 #6, same class as
    // labelPropagation's): the (deg, id) order-collapse key
    // deg·nodeIdBound + node is exact only for ids in [0, nodeIdBound).
    // Rides the existing orientation checkpoint as an observe metric —
    // no extra job; throws before any mis-oriented wedge escapes.
    val idObs = new org.apache.spark.sql.Observation()
    val oriented = und
      .join(deg.select(col("node").as("u"), col("ok").as("u_ok")), "u")
      .join(deg.select(col("node").as("v"), col("ok").as("v_ok")), "v")
      .select(
        when(col("u_ok") < col("v_ok"), col("u")).otherwise(col("v")).as("src"),
        when(col("u_ok") < col("v_ok"), col("v")).otherwise(col("u")).as("dst"),
        greatest(col("u_ok"), col("v_ok")).as("dst_ok"))
      .observe(idObs, min(least(col("src"), col("dst"))).cast("long").as("lo"),
        max(greatest(col("src"), col("dst"))).cast("long").as("hi"))
      .localCheckpoint(true)
    val idLo = idObs.get("lo")
    require(idLo == null || (idLo.asInstanceOf[Long] >= 0L &&
        idObs.get("hi").asInstanceOf[Long] < nodeIdBound),
      s"triangleCounts: node ids must lie in [0, $nodeIdBound) for the exact " +
        s"(deg, id) orientation key (observed [${idLo}, ${idObs.get("hi")}]); " +
        "pass a larger nodeIdBound")
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst_ok") < col("e2.dst_ok"))
      .select(col("e1.src").as("apex"), col("e1.dst").as("a"), col("e2.dst").as("b"))
    val tri = wedges.join(oriented.as("e3"),
      col("a") === col("e3.src") && col("b") === col("e3.dst"))
    val perNode = tri
      .select(explode(array(col("apex"), col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.select(col("node"), col("deg"))
      .join(perNode, Seq("node"), "left_outer")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** Local clustering coefficient per node — c_v = 2·T_v/(deg_v·(deg_v−1))
    * for deg ≥ 2, else 0: "how close is v's neighborhood to a clique",
    * the per-node community-cohesion / spam-farm signal built directly on
    * [[triangleCountsWithDeg]]. Both the numerator (2·T_v) and the
    * denominator (deg·(deg−1)) are exact BIGINTs (deg² < 2⁵³ at any
    * realistic degree), so `coeff` is ONE IEEE division on the 1e-8 grid
    * — cross-engine deterministic. Adds only a narrow projection over
    * the triangle pipeline's existing shuffles. */
  def clusteringCoeff(edges: DataFrame, nodeIdBound: Long = 1000000L): DataFrame =
    triangleCountsWithDeg(edges, nodeIdBound)
      .select(col("node"), col("deg"), col("n_tri"),
        when(col("deg") >= 2, graft.functions.Num.r8(
            (col("n_tri") * 2L).cast("double")
              / (col("deg") * (col("deg") - 1L)).cast("double")))
          .otherwise(lit(0.0)).as("coeff"))

  /** Degree assortativity of an UNDIRECTED graph (directed edge list is
    * canonicalized; self-loops dropped): the Pearson correlation of the
    * endpoint degrees (j, k) over the DIRECTED-BOTH-WAYS edge set — the
    * standard Newman 2002 mixing coefficient. r > 0: hubs attach to hubs
    * (social cores); r < 0: hubs attach to leaves (stars / hub-spoke) —
    * a one-scalar structural audit of any graph the engine builds.
    *
    * Exactness: with both directions present Σj = Σk and Σj² = Σk², so
    * r = (m2·Σjk − (Σj)²) / (m2·Σj² − (Σj)²) with every sum a BIGINT —
    * merge-order-proof; `assortativity` is ONE IEEE division of
    * exact-in-double longs on the 1e-8 grid. Overflow contract:
    * m2·Σjk < 2⁶³ — holds through ~10⁹ edges at bounded degree; beyond
    * that the sums must move to DECIMAL (documented, same rule as
    * [[modularity]]'s m2² bound).
    *
    * Scale shape: one degree aggregate (map-side combined), two co-keyed
    * joins of the |V|-row degree frame onto the edge list (each keyed by
    * one endpoint — the two honest shuffles of any edge-attribute join),
    * then ONE global aggregate combined to a single row. No windows, no
    * self-joins, no collects. */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val both = und.select(col("u").as("s"), col("v").as("d"))
      .unionAll(und.select(col("v").as("s"), col("u").as("d")))
    val deg = both.groupBy(col("s").as("node")).agg(count(lit(1)).as("deg"))
    val jk = both
      .join(deg.select(col("node").as("s"), col("deg").as("j")), "s")
      .join(deg.select(col("node").as("d"), col("deg").as("k")), "d")
    jk.agg(count(lit(1)).as("m2"), sum(col("j")).as("s_j"),
        sum(col("j") * col("k")).as("s_jk"),
        sum(col("j") * col("j")).as("s_j2"))
      .select(col("m2"), col("s_j"), col("s_jk"), col("s_j2"),
        (col("m2") * col("s_jk") - col("s_j") * col("s_j")).as("r_num"),
        (col("m2") * col("s_j2") - col("s_j") * col("s_j")).as("r_den"))
      .select(col("m2"), col("s_j"), col("s_jk"), col("s_j2"),
        col("r_num"), col("r_den"),
        when(col("r_den") > 0, graft.functions.Num.r8(
            col("r_num").cast("double") / col("r_den").cast("double")))
          .otherwise(lit(0.0)).as("assortativity"))
  }

  /** Gini coefficient of the UNDIRECTED degree distribution — the
    * inequality audit beside [[degreeAssortativity]]'s mixing audit:
    * G = 0 all nodes equal, G → 1 a few hubs own the edges. One scalar
    * row (n, sum_deg, s1, g_num, gini).
    *
    * The key scale move: Σᵢ i·d₍ᵢ₎ over the SORTED degrees does not
    * need a global per-node rank — within a block of equal degree v the
    * rank sum is fixed under any tie order (v·(c·C_prev + c(c+1)/2)),
    * so the whole statistic computes from the (degree VALUE, count)
    * distribution: O(distinct degrees) rows, a frame bounded by
    * O(√E) values — the prefix window never sees node-level data.
    * Everything BIGINT (overflow contract n²·maxdeg < 2⁶³, same rule as
    * [[modularity]]'s m2² bound); gini = ONE r8-gridded IEEE division.
    *
    * Scale shape: one degree aggregate, one tiny value-count aggregate,
    * one window + one final aggregate over the distinct-degree frame. */
  def degreeGini(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val dist = deg.groupBy("deg").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("deg")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    dist
      .withColumn("cprev", coalesce(sum("c").over(w), lit(0L)))
      .select(
        sum(col("c")).as("n"),
        sum(col("deg") * col("c")).as("sum_deg"),
        // 2·Σᵢ i·d₍ᵢ₎ kept DOUBLED so every term stays integral without
        // a division (c·(c+1) is even, but `/` in the DSL is double)
        sum(col("deg") * (lit(2L) * col("c") * col("cprev")
          + col("c") * (col("c") + 1L))).as("s1_x2"))
      .select(col("n"), col("sum_deg"), col("s1_x2"),
        (col("s1_x2") - (col("n") + 1L) * col("sum_deg")).as("g_num"))
      .select(col("n"), col("sum_deg"), col("s1_x2"), col("g_num"),
        when(col("n") * col("sum_deg") > 0, graft.functions.Num.r8(
            col("g_num").cast("double")
              / (col("n") * col("sum_deg")).cast("double")))
          .otherwise(lit(0.0)).as("gini"))
  }

  /** Reciprocity of a DIRECTED edge list — the fraction of (distinct,
    * non-loop) edges whose reverse also exists: near 1 on mutual-follow
    * social graphs, near 0 on citation/crawl DAGs; with [[
    * degreeAssortativity]] and [[degreeGini]] the third one-scalar
    * structural audit. Pure integers + ONE r8 IEEE division.
    *
    * Scale shape: one distinct, then a LEFT SEMI self-join keyed on the
    * reversed pair — both sides fed from one localCheckpoint, co-keyed,
    * never cartesian; two count aggregates. */
  def reciprocity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    val mutual = e.join(
      e.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_semi")
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(mutual.agg(count(lit(1)).as("n_recip")))
      .select(col("n_edges"), col("n_recip"),
        when(col("n_edges") > 0, graft.functions.Num.r8(
            col("n_recip").cast("double") / col("n_edges").cast("double")))
          .otherwise(lit(0.0)).as("reciprocity"))
  }

  /** Adamic–Adar link prediction over a BIPARTITE edge list
    * (left, right): for every pair of left nodes sharing ≥ `minCn`
    * right-side neighbors, the common-neighbor count and the AA score
    * Σ_w 1/ln(deg w) over the shared centers w — rarer shared neighbors
    * weigh more (Adamic & Adar 2003). The candidate-pair primitive for
    * recommendation / related-item mining over co-occurrence graphs
    * (parts co-supplied, docs co-cited, users co-active).
    *
    * Exactness: each center's term is quantized ONCE to integer
    * micro-units (floor(10⁸/ln(deg)+0.5), the dq_drift_psi recipe —
    * libm-ulp drift absorbed by the grid), so the per-pair sum is
    * merge-order-proof BIGINT; `aa` is one exact IEEE division of that
    * integer. Wedge centers always have deg ≥ 2 (a deg-1 center has no
    * pair), so ln is never 0.
    *
    * Scale shape: wedge mass is Σ_w C(deg w, 2) — linear in edges when
    * center degree is bounded, which `maxDeg` ENFORCES (the skew guard:
    * a viral hub center contributes C(deg,2) ≈ deg² wedges and ~zero AA
    * weight apiece; dropping centers past the cap is the standard
    * hub-filter, part of the declared contract and mirrored by the
    * oracle). One shuffle keys the (edge ⋈ center-weight) frame by the
    * center for the self-join; the localCheckpoint feeds BOTH sides
    * from one materialization; the pair aggregate is map-side combined. */
  def adamicAdar(edges: DataFrame, maxDeg: Long = 1000L, minCn: Long = 1L): DataFrame = {
    val e = edges.select(col("left"), col("right")).distinct()
    val ctr = e.groupBy("right").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2 && col("deg") <= maxDeg)
      .select(col("right"),
        floor(lit(100000000.0) / log(col("deg").cast("double")) + 0.5)
          .cast("long").as("aa_unit"))
    val tagged = e.join(ctr, "right").localCheckpoint(true)
    tagged.as("a").join(tagged.as("b"),
        col("a.right") === col("b.right") && col("a.left") < col("b.left"))
      .groupBy(col("a.left").as("u"), col("b.left").as("v"))
      .agg(count(lit(1)).as("cn"), sum(col("a.aa_unit")).as("aa_micro"))
      .filter(col("cn") >= minCn)
      .select(col("u"), col("v"), col("cn"), col("aa_micro"),
        (col("aa_micro").cast("double") / 100000000.0).as("aa"))
  }

  /** Neighbor-set Jaccard similarity over a bipartite co-occurrence
    * graph — [[adamicAdar]]'s unweighted sibling and the other classic
    * link-prediction / related-item score: for left-node pairs sharing
    * ≥ `minCn` centers, J(u,v) = |Γu∩Γv| / |Γu∪Γv| =
    * cn / (deg_u + deg_v − cn). All three terms are exact integers over
    * the GUARDED center set (centers with 2 ≤ degree ≤ `maxDeg`; the
    * same hub guard and the same declared contract — degrees count
    * guarded co-occurrences, so the score is a pure function of the
    * guarded subgraph on both engines); J is ONE IEEE division on the
    * 1e-8 grid.
    *
    * Scale shape = [[adamicAdar]]: one center-keyed shuffle, a
    * localCheckpoint feeding both self-join sides, the pair aggregate
    * map-side combined; wedge mass Σ C(deg, 2) bounded by the hub
    * guard; the two degree attachments are joins against the
    * |left-nodes|-row frame, co-keyed on each pair endpoint. */
  def jaccardPairs(edges: DataFrame, maxDeg: Long = 1000L,
      minCn: Long = 1L): DataFrame = {
    val e = edges.select(col("left"), col("right")).distinct()
    val ctr = e.groupBy("right").agg(count(lit(1)).as("d"))
      .filter(col("d") >= 2 && col("d") <= maxDeg)
      .select(col("right"))
    val t = e.join(ctr, "right").localCheckpoint(true)
    val deg = t.groupBy("left").agg(count(lit(1)).as("deg"))
    t.as("a").join(t.as("b"),
        col("a.right") === col("b.right") && col("a.left") < col("b.left"))
      .groupBy(col("a.left").as("u"), col("b.left").as("v"))
      .agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCn)
      .join(deg.select(col("left").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("left").as("v"), col("deg").as("dv")), "v")
      .select(col("u"), col("v"), col("cn"), col("du"), col("dv"),
        graft.functions.Num.r8(col("cn").cast("double")
          / (col("du") + col("dv") - col("cn")).cast("double")).as("jac"))
  }

  /** Newman modularity of a community assignment over a SYMMETRIZED edge
    * list — the standard "are these communities real" score for
    * [[labelPropagation]]'s output (Q ≈ 0: no better than random;
    * Q ≳ 0.3: meaningful structure). Per community c:
    * Q_c = L_c/m − (d_c/2m)², with L_c intra-community edges, d_c the
    * degree mass, m the undirected edge count.
    *
    * Exactness: with m2 = 2m directed sym edges and intra2_c = 2L_c,
    * Q_c·m2² = m2·intra2_c − d_c² — pure BIGINT (q_num). The only float
    * is the final q_contrib = q_num/m2², ONE IEEE division re-gridded to
    * 1e-8 ([[graft.functions.Num.r8]]) — cross-engine deterministic.
    * m2² must fit a LONG: m2 ≤ 3·10⁹ directed edges; beyond that emit
    * q_num against a DECIMAL m2², or report the double only.
    *
    * Scale shape: degrees are one map-side-combined aggregate on the
    * edge list; labels join node-keyed (co-partitioned with the degree
    * frame); the intra count re-keys the edge list twice (src then dst
    * label tag — the two honest shuffles of any edge-attribute join);
    * everything downstream is O(communities). The m2 scalar rides a
    * one-row broadcast, never a driver collect. Both inputs are
    * referenced more than once (edges by deg/intra/m2, labels by the
    * two intra tags and dTot), so a LIVE computation is cut once before
    * use (round 15 — the [[Components]] discipline): without the cut, a
    * label frame fed by [[labelPropagation]] replanned its whole
    * fixed-round chain per reference (the 35-exchange plan of the r14
    * verdict); bare scans stay uncut, a pushed-down re-read being
    * cheaper than copying 100 TB into block storage. */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    def once(df: DataFrame): DataFrame =
      if (Checkpointing.isCheapRescan(df)) df else Checkpointing.cut(df)
    val e = once(edges.select(col("src"), col("dst")))
    val lab = once(labels.select(col("node"), col("label")))
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val dTot = deg.join(lab, "node").groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("d_tot"))
    val intra = e
      .join(lab.select(col("node").as("src"), col("label").as("sl")), "src")
      .join(lab.select(col("node").as("dst"), col("label").as("dl")), "dst")
      .filter(col("sl") === col("dl"))
      .groupBy(col("sl").as("label")).agg(count(lit(1)).as("intra2"))
    val m2 = e.agg(count(lit(1)).as("m2"))
    dTot.join(intra, Seq("label"), "left_outer")
      .select(col("label"), col("n_nodes"),
        coalesce(col("intra2"), lit(0L)).as("intra2"), col("d_tot"))
      .crossJoin(broadcast(m2))
      .select(col("label"), col("n_nodes"), col("intra2"), col("d_tot"),
        (col("m2") * col("intra2") - col("d_tot") * col("d_tot")).as("q_num"),
        graft.functions.Num.r8(
          (col("m2") * col("intra2") - col("d_tot") * col("d_tot")).cast("double")
            / (col("m2") * col("m2")).cast("double")).as("q_contrib"))
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) over DIRECTED edges —
    * the mutual-reinforcement ranking beside [[pagerank]]'s random walk:
    * a good hub points at good authorities, a good authority is pointed
    * at by good hubs. A FIXED round count with max-normalization makes
    * the result a deterministic function of the edge list: scores live
    * as INTEGER micro-units in [0, 10⁸] (hubs start at 10⁸), each
    * half-round sums the opposite side's units along edges — pure LONG
    * arithmetic, associative under any partition or merge order — and
    * renormalizes `unit = floor(raw/max·10⁸ + 0.5)`. The raw sums and
    * their max are exact longs < 2⁵³ (documented regime: in-degree ·
    * 10⁸ < 2⁵³, i.e. in-degree ≲ 9·10⁷ — beyond that, pre-scale the
    * unit grid), so the conversion to double is exact and the
    * divide/multiply/floor chain is the same correctly-rounded IEEE
    * sequence in any engine — the oracle unrolls the identical rounds
    * as CTEs, no rounding-grid slack needed.
    *
    * Scale shape (the [[pagerank]] discipline): the edge list is
    * partitioned and checkpointed ONCE PER DIRECTION (src-keyed for the
    * hub→auth half-round, dst-keyed for auth→hub); each half-round
    * joins a |V|-row unit frame against its co-keyed edge copy and
    * shuffles (node, unit) contribution pairs only. The per-round max
    * is a one-row aggregate riding a broadcast cross join — never a
    * driver collect. Every src has out-edges and every dst in-edges by
    * construction of the edge list, so no node ever loses its score
    * row.
    *
    * Unlike [[pagerank]], the rounds do NOT stay lazy: each half-round's
    * raw-sum frame feeds TWO consumers (the max aggregate and the
    * renormalized select) — the kcore lesson applies, a lazy DAG
    * re-derives the whole upstream chain per consumer and the doubling
    * compounds to 2^(2·iters) recomputations of the base join (measured
    * here exactly as in the oracle's CTE-inlining analog: ~32 s FLAT at
    * every SF before the cut, sub-second after). Each |V|-row raw frame
    * is therefore eagerly localCheckpoint'd — 2·iters cuts of node-sized
    * frames, the bounded-plan shape a long-loop cluster run wants
    * anyway.
    *
    * Round 16 tried the obvious next cut — renormalize the AUTH half
    * IN-PLAN via `crossJoin(broadcast(agg(max)))` so only the hub half
    * pays an eager cut (actions 2·iters → iters). MEASURED WORSE and
    * reverted: AQE reuses only the shuffle MAP output between the
    * broadcast-max subquery and the main chain, so every round re-ran
    * the post-exchange aggregate stage for the max (+34 tasks, +3 jobs
    * per round: 30→41 jobs, 408→543 tasks, wall 3.87→4.10 s warm at
    * sf0.1/local[32]) — the saved action was cheaper than the re-run
    * stage. The renorm max therefore stays an action barrier per
    * half-round; the per-half-round cut is the minimal shape
    * (OPTIMIZATION_r16.md records the numbers). */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1)
    val e = edges.select(col("src"), col("dst")).distinct()
    val edSrc = Dist.byKeysCut(e, "src")
    val edDst = Dist.byKeysCut(edSrc, "dst")
    val unit = lit(100000000L)
    var hub = edSrc.select(col("src").as("node")).distinct()
      .select(col("node"), unit.as("unit"))
    var auth: DataFrame = null
    def renorm(raw0: DataFrame): DataFrame = {
      // the max rides the checkpoint job as an observe metric (round 15)
      // and comes back as a broadcast-free literal: the old
      // crossJoin(broadcast(agg(max))) re-scanned the checkpointed frame
      // and built one broadcast relation per half-round — 2·iters extra
      // jobs for a scalar the cut job already knows. Same IEEE chain
      // (long max, exact in double), bit-identical units.
      val mObs = new org.apache.spark.sql.Observation()
      val raw = raw0.observe(mObs, max(col("raw")).as("m"))
        .localCheckpoint(true) // single eval for both consumers
      mObs.get("m") match {
        // an EMPTY graph observes a null max (zero rows): return the
        // empty frame with the unit column in place instead of NPE-ing
        // on the cast (ADVICE r15 — the pre-r15 broadcast form
        // null-propagated to an empty result; same degenerate contract,
        // made explicit)
        case null => raw.select(col("node"), col("raw").as("unit"))
        case m => raw.select(col("node"),
          floor(col("raw").cast("double") / lit(m.asInstanceOf[Long]).cast("double")
            * lit(100000000.0) + lit(0.5)).cast("long").as("unit"))
      }
    }
    for (i <- 1 to iters) {
      auth = renorm(
        hub.join(edSrc, hub("node") === edSrc("src"))
          .groupBy(col("dst").as("node")).agg(sum("unit").as("raw")))
      hub = renorm(
        auth.join(edDst, auth("node") === edDst("dst"))
          .groupBy(col("src").as("node")).agg(sum("unit").as("raw")))
    }
    hub.select(lit("hub").as("role"), col("node"), col("unit"))
      .unionAll(auth.select(lit("auth").as("role"), col("node"), col("unit")))
      .select(col("role"), col("node"), col("unit"),
        (col("unit").cast("double") / lit(100000000.0)).as("score"))
  }
}

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
  */
object Graph {

  /** Min hop distance from `seed` to every node reachable within
    * `maxDepth` hops over DIRECTED edges (`src`, `dst`). Returns
    * (node, dist) including (seed, 0). Undirected graphs pass a
    * symmetrized edge list. `maxDepth` bounds the loop on BOTH engines
    * (the DuckDB oracle caps its recursive CTE identically), so results
    * are well-defined even on cyclic graphs.
    *
    * Each loop round expands TWO frontier depths inside ONE action
    * (hop-1 frame persisted so the hop-2 branch reuses it instead of
    * recomputing the join): the per-round cost at toy SF is the
    * scheduler/checkpoint floor, not data, so halving the number of
    * actions halves the dominant term; at cluster scale the floor
    * amortizes and the persisted hop-1 keeps per-depth join work
    * identical to the one-hop-per-action form. BFS layering is
    * preserved because every node at distance d+2 is a neighbor of some
    * node at distance d+1: hop-2 candidates are exactly
    * neighbors(hop1) ∖ (visited ∪ hop1). */
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
      val twoHop = depth + 2 <= maxDepth
      val obs = new org.apache.spark.sql.Observation(s"bfs_$depth")
      val hop1 = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .select(col("node"), lit(depth + 1).as("dist"))
      val h1 = if (twoHop) Some(hop1.persist()) else None
      val next = h1 match {
        case None => hop1
        case Some(h) => h.unionAll(
          h.join(e, h("node") === e("src"))
            .select(col("dst").as("node")).distinct()
            .join(visited.select("node").unionAll(h.select("node")),
              Seq("node"), "left_anti")
            .select(col("node"), lit(depth + 2).as("dist")))
      }
      val nextCp = next
        .observe(obs,
          count(lit(1)).as("n"),
          coalesce(max(col("dist")), lit(0)).as("maxd"))
        .pipe(Checkpointing.cut)
      val n = obs.get("n").asInstanceOf[Long]
      val maxd = obs.get("maxd").asInstanceOf[Int]
      h1.foreach(_.unpersist()) // nextCp is materialized; hop-1 blocks done
      // done when nothing new was reached, or when the two-hop round's
      // SECOND hop came up empty (no node at depth+2 ⇒ none deeper)
      done = n == 0 || (twoHop && maxd < depth + 2)
      if (n > 0) {
        // no checkpoint on visited: it's a union of ≤ maxDepth frames that
        // are EACH checkpointed, so the plan stays shallow and re-reading
        // it is a cache scan (round time is dominated by the
        // join/distinct/anti-join jobs either way — the same ~0.5 s/round
        // toy-SF floor as the CC loop, halved by the two-hop rounds and
        // amortizing with data size)
        visited = visited.unionAll(nextCp)
        // only the DEEPEST layer can reach unvisited nodes next round
        frontier =
          if (twoHop) nextCp.filter(col("dist") === lit(depth + 2)) else nextCp
      }
      depth += (if (twoHop) 2 else 1)
    }
    e.unpersist()
    visited
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Components

class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two components and a chain resolve to their min ids") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (7L, 9L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("a 12-node chain converges (diameter-bound rounds)") {
    val got = cc((1L to 11L).map(i => (i, i + 1)))
    assert(got.values.toSet == Set(1L))
    assert(got.size == 12)
  }

  test("matches a scala union-find on a pseudo-random graph") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 150).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    // reference: union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonical label = min node id in component
    val byRoot = nodes.groupBy(find)
    val want = byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
    assert(cc(edges) == want)
  }

  test("semantic dedup keeps one representative per cluster") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val clusters = Components.semanticDedup(pairs)
    val reps = clusters.groupBy("cluster_id").agg(min("vec_id").as("rep"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps == Map(1L -> 1L, 10L -> 10L)) // rep == cluster id
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Pq}

/** Unit coverage for product quantization: crafted subspace structure is
  * recovered, codes agree with the per-subspace exact-Lloyd assignment
  * (the composition contract the oracle replays), and the encode pass
  * stays narrow. */
class PqSpec extends SparkTestBase {

  import spark.implicits._

  test("pqCodes recovers independent structure per subspace") {
    // dims 1-2 separate ids {1,2} from {3,4}; dims 3-4 separate {1,3}
    // from {2,4} — the two subspaces carry INDEPENDENT groupings, the
    // thing PQ encodes and a single global k-means cannot
    val e = Seq(
      (1L, Seq(1.0f, 1.0f, 5.0f, 5.0f)),
      (2L, Seq(1.0f, 1.1f, -5.0f, -5.0f)),
      (3L, Seq(-1.0f, -1.0f, 5.1f, 5.0f)),
      (4L, Seq(-1.0f, -1.1f, -5.1f, -5.0f))
    ).toDF("vec_id", "embedding")
    val m = Pq.pqCodes(e, dims = 4, subspaces = 2, k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // subspace 0: {1,2} together, {3,4} together; subspace 1: {1,3} vs {2,4}
    assert(m(1L)._1 == m(2L)._1 && m(3L)._1 == m(4L)._1 && m(1L)._1 != m(3L)._1, m.toString)
    assert(m(1L)._2 == m(3L)._2 && m(2L)._2 == m(4L)._2 && m(1L)._2 != m(2L)._2, m.toString)
  }

  test("pqCodes equals the per-subspace kmeansAssign cluster, subspace by subspace") {
    val rnd = new scala.util.Random(31)
    val e = (1L to 60L).map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val codes = Pq.pqCodes(e, dims = 8, subspaces = 4, k = 3, rounds = 2)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getInt).toSeq).toMap
    for (s <- 0 until 4) {
      val sub = Clustering.kmeansExact(
        e.select(col("vec_id"), slice(col("embedding"), s * 2 + 1, 2).as("embedding")),
        k = 3, rounds = 2)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      for ((id, cs) <- codes)
        assert(cs(s) == sub(id), s"subspace $s id $id: ${cs(s)} vs ${sub(id)}")
    }
  }
}

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

  test("adcRecall: exact truth ranks by true quantized d2; recall in [0,1]; query always a truth hit") {
    val rnd = new scala.util.Random(7)
    val e = (0L to 49L).map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    // truth side brute-forced on the driver from the same 1e-6 grid
    val q = Clustering.quantized(col("embedding"))
    val vecs = e.select(col("vec_id"), q.as("qe")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val qq = vecs(0L)
    val expectTruth = vecs.toSeq.map { case (id, v) =>
      (v.zip(qq).map { case (a, b) => (a - b) * (a - b) }.sum, id)
    }.sorted.take(5).map(_._2).toSet
    val gotTruth = Pq.exactTopK(e, 0L, dims = 8, topK = 5)
      .collect().map(_.getLong(0)).toSet
    assert(gotTruth == expectTruth)
    assert(gotTruth.contains(0L)) // the query's own d2 is 0
    val row = Pq.adcRecall(e, 0L, dims = 8, subspaces = 2, k = 2,
      rounds = 2, topK = 5).collect().head
    assert(row.getLong(0) == 5L)
    assert(row.getLong(1) >= 1L && row.getLong(1) <= 5L) // query hits both sides
    val rec = row.getDouble(2)
    assert(rec >= 0.2 && rec <= 1.0 && rec == row.getLong(1).toDouble / 5.0)
  }
}

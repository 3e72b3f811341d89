package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** Unit coverage for exact Lloyd k-means (operators/Clustering):
  * hand-computed expectations on crafted vectors — separated clusters
  * recover, the (d2, cl) tie-break is deterministic, an emptied cluster
  * keeps its previous centroid, and assignments agree with an in-memory
  * reference on random inputs. */
class ClusteringSpec extends SparkTestBase {

  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("two well-separated blobs recover in one round from same-blob seeds") {
    // seeds are ids 1,2 (one per blob); dims = 2 keeps hand-checking easy
    val e = emb(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(10.0f, 10.0f),
      3L -> Seq(0.1f, -0.1f), 4L -> Seq(9.9f, 10.1f),
      5L -> Seq(0.2f, 0.1f), 6L -> Seq(10.2f, 9.8f))
    val out = Clustering.kmeansExact(e, k = 2, rounds = 2)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toSeq
    assert(out === Seq(1L -> 1, 2L -> 2, 3L -> 1, 4L -> 2, 5L -> 1, 6L -> 2))
  }

  test("equidistant vector breaks the tie toward the smallest cluster id") {
    // with 0 rounds the centroids stay at the seeds (ids 1 and 2);
    // id 3 sits exactly midway on the quantized grid
    val e = emb(
      1L -> Seq(0.0f), 2L -> Seq(2.0f), 3L -> Seq(1.0f))
    val out = Clustering.kmeansExact(e, k = 2, rounds = 0)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toSeq
    assert(out === Seq(1L -> 1, 2L -> 2, 3L -> 1))
  }

  test("an emptied cluster keeps its previous centroid and can re-fill") {
    // identical seeds (ids 1,2 both at 0.0): round 1 ties EVERY vector
    // into cluster 1, so cluster 2 empties and must keep centroid 0.0.
    // Cluster 1's mean moves to 0.5 — in round 2 the kept 0.0 centroid
    // wins the near-zero vectors back. Without the keep rule cluster 2
    // could never resurrect.
    val e = emb(
      1L -> Seq(0.0f), 2L -> Seq(0.0f), 3L -> Seq(1.0f), 4L -> Seq(1.0f))
    val out = Clustering.kmeansExact(e, k = 2, rounds = 2)
      .select("vec_id", "cluster", "d2").as[(Long, Int, Long)].collect().toSeq
    assert(out.map(r => r._1 -> r._2) === Seq(1L -> 2, 2L -> 2, 3L -> 1, 4L -> 1))
    // exact-integer d2: id 1 sits ON the kept centroid
    assert(out.find(_._1 == 1L).get._3 === 0L)
  }

  test("clusterBalancedSample: equal shares within binomial noise, small clusters kept whole") {
    val rnd = new scala.util.Random(11)
    // two fat blobs (200 each) + one tiny blob (10): balanced keep at
    // ratio 0.5 targets ~68 per cluster -> the tiny blob survives whole
    def blob(c: Float, n: Int, from: Long) =
      (0 until n).map(i => (from + i) -> Seq.fill(4)(c + 0.01f * rnd.nextFloat()))
    val e = (blob(0.0f, 1, 1) ++ blob(5.0f, 1, 2) ++ blob(10.0f, 1, 3) ++
      blob(0.0f, 199, 100) ++ blob(5.0f, 199, 1000) ++ blob(10.0f, 8, 5000))
      .toDF("vec_id", "embedding")
    val kept = graft.operators.Clustering
      .clusterBalancedSample(e, k = 3, rounds = 2, keepRatio = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val byCl = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // total N=409, target m = floor(0.5*409/3+0.5) = 68 per cluster
    val tiny = byCl.values.min
    assert(tiny == 9, s"tiny cluster must be kept whole: $byCl") // 8+1 members
    for ((cl, n) <- byCl if n != tiny)
      assert(math.abs(n - 68) <= 4 * math.sqrt(68.0) + 2, s"cluster $cl kept $n, target 68")
    // deterministic under re-run
    val again = graft.operators.Clustering
      .clusterBalancedSample(e, k = 3, rounds = 2, keepRatio = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(kept.toSet == again.toSet)
  }

  test("assignments agree with an in-memory reference on random vectors") {
    val rnd = new scala.util.Random(7)
    val dims = 8
    val n = 60
    val vecs = (1L to n).map(i => i -> Seq.fill(dims)(rnd.nextFloat() * 2 - 1))
    val k = 3
    val rounds = 2

    // in-memory reference: the same quantize / argmin / requantize chain
    def quant(v: Seq[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1000000 + 0.5).toLong).toArray
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val q = vecs.map { case (id, v) => id -> quant(v) }
    var cents = q.sortBy(_._1).take(k).map(_._2).toArray
    def assign(): Map[Long, Int] = q.map { case (id, v) =>
      id -> (cents.zipWithIndex.map { case (c, i) => (d2(v, c), i + 1) }.min._2)
    }.toMap
    for (_ <- 1 to rounds) {
      val a = assign()
      val byCl = q.groupBy { case (id, _) => a(id) }
      cents = cents.zipWithIndex.map { case (old, i) =>
        byCl.get(i + 1) match {
          case Some(members) =>
            val sums = members.map(_._2).transpose.map(_.sum)
            sums.map(s => math.floor(s.toDouble / members.size + 0.5).toLong).toArray
          case None => old
        }
      }
    }
    val expect = assign()

    val out = Clustering.kmeansExact(vecs.toDF("vec_id", "embedding"), k, rounds)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(out === expect)
  }

  test("trainCentroidsMulti is bit-identical to per-spec trainCentroids " +
      "(incl. an overlapping full-width coarse spec and distinct ks)") {
    val rnd = new scala.util.Random(47)
    val e = (1L to 80L).map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    // coarse spec spans ALL dims and overlaps the two half-width specs;
    // ks differ so the shared seed collect must slice per spec
    val specs = Seq((0, 8, 3), (0, 4, 2), (4, 4, 4))
    for (rounds <- Seq(0, 1, 2)) {
      val fused = Clustering.trainCentroidsMulti(e, specs, rounds)
      val solo = specs.map { case (off, w, k) =>
        Clustering.trainCentroids(
          e.select(col("vec_id"),
            slice(col("embedding"), off + 1, w).as("embedding")),
          k, rounds)
      }
      fused.zip(solo).zipWithIndex.foreach { case ((f, s), i) =>
        assert(f.map(_.toSeq).toSeq === s.map(_.toSeq).toSeq,
          s"spec $i rounds $rounds")
      }
    }
  }
}

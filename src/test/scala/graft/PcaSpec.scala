package graft

import graft.operators.Pca

/** Unit coverage for the power-iteration top-PC operator: a dominant
  * direction is recovered on crafted data, the degenerate all-zero
  * corpus survives (keep-previous-direction guard), and projections
  * agree with an in-memory replica of the exact quantized chain. */
class PcaSpec extends SparkTestBase {

  import spark.implicits._

  test("dominant axis recovered: projections ~ the x-coordinate, orthogonal noise ignored") {
    // variance concentrated on dim 1; dim 2 is small noise. After 3
    // rounds the direction is ~e1, so score(v) ~ x within the grids.
    val e = Seq(
      (1L, Seq(1.0f, 0.01f)), (2L, Seq(-1.0f, 0.02f)),
      (3L, Seq(0.5f, -0.01f)), (4L, Seq(-0.5f, -0.02f)),
      (5L, Seq(0.8f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Pca.topPcProjection(e, dims = 2, rounds = 3)
      .as[(Long, Double)].collect().toMap
    val xs = Map(1L -> 1.0, 2L -> -1.0, 3L -> 0.5, 4L -> -0.5, 5L -> 0.8)
    for ((id, x) <- xs)
      assert(math.abs(out(id) - x) < 0.01, s"id=$id score=${out(id)} x=$x")
  }

  test("whitening: residual norm ~0 for vectors on the dominant axis, ~full norm off-axis") {
    // dims 1-2: variance on dim 1 ⇒ top PC ~ e1. A vector ON the axis
    // whitens to ~0; a vector on dim 2 keeps its whole norm.
    val e = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)), (3L, Seq(0.5f, 0.0f)),
      (4L, Seq(0.0f, 0.3f))
    ).toDF("vec_id", "embedding")
    val out = Pca.whitenResidualNorm(e, dims = 2, rounds = 3)
      .as[(Long, Double)].collect().toMap
    assert(out(1L) < 0.001 && out(2L) < 0.001 && out(3L) < 0.001, out.toString)
    assert(math.abs(out(4L) - 0.3) < 0.001, out.toString)
  }

  test("whitening: residual never exceeds the vector norm and is clamped at 0") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 40L).map(i => (i, Seq.fill(4)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Pca.whitenResidualNorm(df, dims = 4, rounds = 3)
      .as[(Long, Double)].collect().toMap
    val norms = vecs.map { case (id, v) =>
      id -> math.sqrt(v.map(x => x.toDouble * x).sum)
    }.toMap
    for ((id, r) <- out) {
      assert(r >= 0.0, s"id=$id resid=$r")
      assert(r <= norms(id) + 1e-4, s"id=$id resid=$r norm=${norms(id)}")
    }
  }

  test("all-zero corpus: zero iterate keeps the seed direction, scores all 0") {
    val e = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Pca.topPcProjection(e, dims = 2, rounds = 2)
      .as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 0.0, 2L -> 0.0))
  }

  test("projections agree with an in-memory replica of the quantized chain") {
    val rnd = new scala.util.Random(13)
    val dims = 8
    val vecs = (1L to 50L).map(i => i -> Seq.fill(dims)(rnd.nextFloat() * 2 - 1))
    val rounds = 3

    def quant(v: Seq[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1000000 + 0.5).toLong).toArray
    val q = vecs.map { case (id, v) => id -> quant(v) }
    var dir = Array.tabulate(dims)(d => if (d == 0) 1000000L else 0L)
    for (_ <- 1 to rounds) {
      val dots = q.map { case (id, x) =>
        id -> math.floor(x.zip(dir).map { case (a, b) => a * b }.sum.toDouble / 1000000.0).toLong
      }.toMap
      val s = new Array[Long](dims)
      for ((id, x) <- q; d <- 0 until dims) s(d) += x(d) * dots(id)
      val c = math.max(1L, math.floor(s.map(math.abs).max.toDouble / 100000000.0).toLong)
      val sq = s.map(x => math.floor(x.toDouble / c).toLong)
      val n2 = sq.map(x => x * x).sum
      if (n2 > 0) {
        val norm = math.sqrt(n2.toDouble)
        dir = sq.map(x => math.floor(x.toDouble / norm * 1000000.0 + 0.5).toLong)
      }
    }
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val expect = q.map { case (id, x) =>
      id -> r4(x.zip(dir).map { case (a, b) => a * b }.sum.toDouble / 1.0e12)
    }.toMap

    val out = Pca.topPcProjection(vecs.toDF("vec_id", "embedding"), dims, rounds)
      .as[(Long, Double)].collect().toMap
    assert(out == expect)
  }
}

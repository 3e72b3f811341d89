package graft

import org.apache.spark.sql.functions._
import graft.operators.Drift

/** Unit coverage for PSI drift: identical snapshots score ~0, an induced
  * shift scores positive, reference-anchored bins clamp out-of-range
  * current values, and the degenerate constant reference survives. */
class DriftSpec extends SparkTestBase {

  import spark.implicits._

  private def df(vs: Seq[Double]) = vs.map(Tuple1(_)).toDF("v")

  test("identical distributions: psi ~ 0 (smoothing keeps it finite)") {
    val vs = (1 to 100).map(_.toDouble)
    val out = Drift.psi(df(vs), df(vs), col("v"), 10)
      .as[(Double, Long, Long)].head()
    assert(math.abs(out._1) < 1e-9, out.toString)
    assert(out._2 == 100L && out._3 == 100L)
  }

  test("induced shift scores positive and larger than a mild one") {
    val ref = (1 to 200).map(_.toDouble)
    val mild = (1 to 200).map(i => i.toDouble + 10) // small translation
    val hard = (1 to 200).map(i => (i % 20).toDouble) // collapsed to head
    val pMild = Drift.psi(df(ref), df(mild), col("v"), 10)
      .as[(Double, Long, Long)].head()._1
    val pHard = Drift.psi(df(ref), df(hard), col("v"), 10)
      .as[(Double, Long, Long)].head()._1
    assert(pMild > 0.0 && pHard > pMild, s"mild=$pMild hard=$pHard")
  }

  test("current values outside the reference range clamp to the edge bins") {
    val ref = (1 to 100).map(_.toDouble)
    val cur = Seq.fill(50)(-1000.0) ++ Seq.fill(50)(1000.0)
    val out = Drift.psi(df(ref), df(cur), col("v"), 10)
      .as[(Double, Long, Long)].head()
    assert(out._1 > 0.5 && out._3 == 100L, out.toString) // extreme drift, all rows kept
  }

  test("degenerate constant reference: everything lands in bin 0, psi reflects counts only") {
    val ref = Seq.fill(40)(5.0)
    val cur = Seq.fill(40)(5.0)
    val out = Drift.psi(df(ref), df(cur), col("v"), 10)
      .as[(Double, Long, Long)].head()
    assert(math.abs(out._1) < 1e-9, out.toString)
  }

  test("NULL values are ignored on both sides") {
    val ref = df((1 to 50).map(_.toDouble)).unionAll(
      Seq(Tuple1(null.asInstanceOf[java.lang.Double])).toDF("v"))
    val out = Drift.psi(ref, ref, col("v"), 10).as[(Double, Long, Long)].head()
    assert(out._2 == 50L && out._3 == 50L)
  }
}

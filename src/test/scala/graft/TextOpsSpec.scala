package graft

import org.apache.spark.sql.functions._
import graft.functions.{Num, TextOps, TimeOps, VectorOps}

class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("tokens and shingles") {
    val r = one("A b  c d").select(
      TextOps.tokens($"text").as("t"),
      TextOps.shingles($"text", 2).as("s")).head()
    assert(r.getSeq[String](0) == Seq("a", "b", "c", "d"))
    assert(r.getSeq[String](1) == Seq("a b", "b c", "c d"))
  }

  test("shingles of short doc is empty-safe") {
    val r = one("a b").select(TextOps.shingles($"text", 3).as("s")).head()
    assert(r.getSeq[String](0).isEmpty)
  }

  test("regexTokenCount counts word, number and symbol runs") {
    val r = one("Hello world42 !!").select(TextOps.regexTokenCount($"text")).head()
    // hello | world | 42 | ! | ! -> 5
    assert(r.getInt(0) == 5)
  }

  test("qualityScore is in (0,1) and favors mid-length docs") {
    val rows = Tables.documents(spark, sf)
      .select(TextOps.qualityScore($"text").as("q")).collect()
    assert(rows.forall(r => r.getDouble(0) > 0 && r.getDouble(0) < 1))
  }

  test("simhash: identical docs collide, near docs are close, far docs are far") {
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val near = (1 to 48).map(i => s"w$i").mkString(" ") + " q1 q2"
    val far = (1 to 50).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("id", "text")
      .select($"id", TextOps.simhash64($"text").as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) == 0)
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L)))
  }

  test("fingerprints: deterministic, sorted, shift-invariant head") {
    val df = one("the quick brown fox jumps over the lazy dog repeatedly")
    val a = df.select(TextOps.fingerprints($"text").as("f")).head().getSeq[Long](0)
    val b = df.select(TextOps.fingerprints($"text").as("f")).head().getSeq[Long](0)
    assert(a == b && a == a.sorted && a.nonEmpty)
  }

  test("nsToSec / nsToUs are exact at second and microsecond boundaries") {
    val vals = Seq(1704067200000000000L, 1704067200999999999L, 1706657176220708106L,
      1704067200000000999L)
    val df = vals.map(Tuple1(_)).toDF("ns")
      .select($"ns", TimeOps.nsToSec($"ns").as("s"), TimeOps.nsToUs($"ns").as("us"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == Math.floorDiv(r.getLong(0), 1000000000L))
      assert(r.getLong(2) == Math.floorDiv(r.getLong(0), 1000L))
    }
  }

  test("r4 matches floor-half-up semantics, including negatives") {
    val df = Seq(0.00005, 1.23455, -0.123455, 86684.10495).map(Tuple1(_)).toDF("x")
      .select(Num.r4($"x").as("r"))
    val got = df.collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(math.floor(0.00005 * 10000 + 0.5) / 10000,
      math.floor(1.23455 * 10000 + 0.5) / 10000,
      math.floor(-0.123455 * 10000 + 0.5) / 10000,
      math.floor(86684.10495 * 10000 + 0.5) / 10000))
  }

  test("text_readability: hand-counted words/sentences/syllables and the FRE chain") {
    // "the cat sat. it ran!" → words 5, sentence runs 2,
    // vowel groups: e,a,a,i,a = 5
    val got = QueriesLLM.all("text_readability")(spark, sf)
    // fixture-independent check on a planted frame via the same chain:
    val df = Seq((1L, "the cat sat. it ran!"), (2L, "no punctuation here"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("w"),
        greatest(lit(1L), regexp_count(col("text"), lit("[.!?]+")).cast("long")).as("s"),
        regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long").as("y"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, w, s, y) => id -> ((w, s, y)) }.toMap
    // tokens splits on single spaces: "sat." and "ran!" count as words
    assert(out(1L) == ((5L, 2L, 5L)), s"planted counts: ${out(1L)}")
    // punctuation-free text floors sentences at 1 (no div-by-zero)
    assert(out(2L)._2 == 1L)
    def fre(w: Long, s: Long, y: Long) = math.floor(
      (206.835 - 1.015 * (w.toDouble / s) - 84.6 * (y.toDouble / w)) * 1e4 + 0.5) / 1e4
    // the registered query's values replay exactly on the fixture head
    val head = got.limit(3).collect()
    head.foreach { r =>
      assert(r.getDouble(4) == fre(r.getLong(1), r.getLong(2), r.getLong(3)),
        s"FRE chain mismatch for doc ${r.getLong(0)}")
    }
    assert(head.nonEmpty)
  }

  test("VectorOps dot/norm/cosine on known vectors") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 0.0f))).toDF("a", "b")
    val r = df.select(
      VectorOps.dot($"a", $"b").as("d"),
      VectorOps.norm($"a").as("na"),
      VectorOps.cosine($"a", $"b").as("c")).head()
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 2.0 / (3.0 * 2.0)) < 1e-12)
  }
}

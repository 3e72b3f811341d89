package graft

import org.apache.spark.sql.functions._
import graft.operators.{Components, Dedup, HotBucket, Similarity}

/** The LSH hot-bucket frequency guard (VERDICT r03 #2): an adversarial
  * all-identical corpus — the "one viral duplicate" skew case — must
  * yield a LINEAR candidate count under the guard, while healthy corpora
  * are untouched (guard inert at the default threshold). */
class HotBucketSpec extends SparkTestBase {
  import spark.implicits._

  private def identicalDocs(n: Int) =
    (0 until n).map(i => (i.toLong, "the same viral spam text repeated verbatim"))
      .toDF("doc_id", "text")

  test("all-identical corpus: guarded MinHash candidates are linear, not quadratic") {
    val docs = identicalDocs(400)
    val sigs = Dedup.minhashSignatures(docs, col("text"), col("doc_id"))
    val guarded = Dedup.candidatesFromSignatures(sigs, maxBucket = 32)
    val nGuard = guarded.count()
    // every band bucket holds all 400 docs -> star to the minimum: n-1
    // distinct pairs, not n(n-1)/2 = 79 800
    assert(nGuard == 399L, s"expected 399 star pairs, got $nGuard")
    // connectivity is preserved: the star keeps the spam family ONE cluster
    val clusters = Components.semanticDedup(
      guarded.select(col("a_id"), col("b_id")))
      .select(countDistinct(col("cluster_id"))).head().getLong(0)
    assert(clusters == 1L)
    // without the guard the same corpus is quadratic
    val nFull = Dedup.candidatesFromSignatures(sigs).count()
    assert(nFull == 400L * 399 / 2, s"unguarded should be all-pairs, got $nFull")
  }

  test("all-identical embeddings: guarded SRP candidates are linear") {
    val rows = (0 until 300).map(i => (i.toLong, Array.fill(8)(0.5f)))
    val emb = rows.toDF("vec_id", "embedding")
    val nGuard = Similarity.pairsLshCandidateCount(emb, 16, 4, maxBucket = 16)
    assert(nGuard == 299L, s"expected 299 star pairs, got $nGuard")
    // the star pairs all rescore to cosine 1.0 and survive the threshold
    val pairs = Similarity.pairsLsh(emb, 0.9, maxBucket = 16)
    assert(pairs.count() == 299L)
    assert(pairs.agg(min(col("cosine"))).head().getDouble(0) == 1.0)
  }

  test("guard is inert on the healthy fixture corpus at the default threshold") {
    val emb = Tables.embeddings(spark, sf)
    val guarded = Similarity.pairsLshCandidateCount(emb, 16, 4)
    val unguarded = Similarity.pairsLshCandidateCount(emb, 16, 4,
      maxBucket = Int.MaxValue)
    assert(guarded == unguarded)
  }

  test("mixed corpus: hot bucket capped, cold buckets keep exact all-pairs") {
    // two distinct doc families + one hot spam family in the same frame
    val spam = (0 until 100).map(i => (1000L + i, "spam spam spam spam spam spam"))
    val a = Seq((1L, "alpha bravo charlie delta echo foxtrot golf hotel"))
    val b = Seq((2L, "india juliett kilo lima mike november oscar papa"))
    val docs = (spam ++ a ++ b).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, col("text"), col("doc_id"))
    val pairs = Dedup.candidatesFromSignatures(sigs, maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // spam family: 99 star pairs to its min id; the two singletons don't
    // collide with anything (distinct shingle sets, no shared bands)
    assert(pairs.count { case (x, y) => x >= 1000 && y >= 1000 } == 99)
    assert(pairs.forall { case (x, y) => x >= 1000 && y >= 1000 })
  }
}

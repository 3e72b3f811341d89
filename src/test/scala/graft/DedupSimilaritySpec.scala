package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("exact dedup keeps min id per normalized text") {
    val df = docsDf(Seq((1L, "a b c"), (2L, " A B C "), (3L, "x y z")))
    val out = Dedup.exact(df, col("text"), col("doc_id"))
      .orderBy("keep_id").collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L)) // 2 folded into 1
    assert(out.head.getLong(2) == 2L) // n_dups
  }

  test("dedup is idempotent") {
    val df = Tables.documents(spark, sf)
    val once = Dedup.exact(df, col("text"), col("doc_id"))
    val kept = df.join(once.select(col("keep_id").as("doc_id")), "doc_id")
    val twice = Dedup.exact(kept, col("text"), col("doc_id"))
    assert(once.count() == twice.count())
  }

  test("incremental dedup: seen content is dropped, batch dups collapse") {
    val state = docsDf(Seq((1L, "a b c"), (2L, "x y z")))
    val stateHashes = Dedup.exact(state, col("text"), col("doc_id")).select("text_hash")
    // 10 re-sends normalized-equal state content; 11/12 are an intra-batch dup pair
    val batch = docsDf(Seq((10L, " A B C "), (11L, "new stuff"), (12L, "NEW stuff"), (13L, "other")))
    val out = Dedup.incrementalExact(batch, stateHashes, col("text"), col("doc_id"))
      .orderBy("keep_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((11L, 2L), (13L, 1L)))
  }

  test("incremental dedup: state ∪ increment == full-corpus dedup (hash sets)") {
    val docs = Tables.documents(spark, sf)
    val stateDocs = docs.filter(col("doc_id") % 5 < 2)
    val batchDocs = docs.filter(col("doc_id") % 5 >= 2)
    val stateH = Dedup.exact(stateDocs, col("text"), col("doc_id")).select("text_hash")
    val incH = Dedup.incrementalExact(batchDocs, stateH, col("text"), col("doc_id"))
      .select("text_hash")
    val fullH = Dedup.exact(docs, col("text"), col("doc_id")).select("text_hash")
    assert(stateH.intersect(incH).count() == 0, "increment must not re-emit state content")
    assert(stateH.union(incH).distinct().count() == fullH.count(),
      "state plus increment must cover exactly the full dedup's content")
  }

  test("incremental dedup with empty state degenerates to exact dedup") {
    val batch = docsDf(Seq((1L, "a"), (2L, "A "), (3L, "b")))
    val empty = spark.emptyDataset[String].toDF("text_hash")
    val inc = Dedup.incrementalExact(batch, empty, col("text"), col("doc_id"))
    val full = Dedup.exact(batch, col("text"), col("doc_id"))
      .select("text_hash", "keep_id", "n_dups")
    assert(inc.select("text_hash", "keep_id", "n_batch_dups").except(full).count() == 0)
    assert(inc.count() == full.count())
  }

  test("minhash estimate tracks exact jaccard within 0.2 on near-dups") {
    // doc pairs with known high/low overlap
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = (1 to 57).map(i => s"w$i").mkString(" ") + " x1 x2 x3"
    val far = (100 to 160).map(i => s"v$i").mkString(" ")
    val df = docsDf(Seq((1L, base), (2L, near), (3L, far)))
    val cands = Dedup.minhashCandidates(df, col("text"), col("doc_id"), bands = 32)
    val verified = Dedup.minhashVerify(cands, df, col("text"), col("doc_id")).collect()
    val est12 = verified.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(est12.isDefined, "near-dup pair (1,2) must be an LSH candidate")
    // exact shingle jaccard of (base, near): 55 shared of 63 distinct shingles ≈ 0.84
    assert(math.abs(est12.get.getDouble(2) - 0.84) < 0.2)
    assert(!verified.exists(r => r.getLong(0) == 1L && r.getLong(1) == 3L && r.getDouble(2) > 0.3))
  }

  test("simhash finds near-dups and hamming is 0 for identical docs") {
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val near = (1 to 49).map(i => s"w$i").mkString(" ") + " zz"
    val df = docsDf(Seq((1L, base), (2L, base), (3L, near), (4L, "completely different words entirely")))
    val pairs = Dedup.simhashPairs(df, col("text"), col("doc_id"), maxHamming = 10).collect()
    val p12 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(p12.isDefined && p12.get.getInt(2) == 0)
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 3L))
  }

  test("jaccardPairs computes exact jaccard on known sets") {
    val a = "a b c d e f"   // shingles(3): abc bcd cde def
    val b = "a b c d e z"   // shingles: abc bcd cde dez -> inter 3, union 5
    val df = docsDf(Seq((1L, a), (2L, b)))
    val out = Dedup.jaccardPairs(df, col("text"), col("doc_id"), 0.1).collect()
    assert(out.length == 1)
    assert(math.abs(out.head.getDouble(2) - 3.0 / 5.0) < 1e-9)
  }

  test("jaccard/containment pairs identical in the FORCED sort-merge regime (round 16)") {
    // the posting checkpoint declares sh-partitioning + within-partition
    // ordering (Dist.byKeysCut); the SMJ regime consumes it through
    // LogicalRDD.newInstance's attribute remap on the self-join's second
    // side — this pins that the declared properties survive the remap
    // (a mis-remapped declaration would silently skip a required sort
    // and drop pairs)
    val docs = docsDf((1L to 40L).map(i =>
      (i, s"w${i % 7} w${i % 5} w${i % 3} common tail words w${i % 11} w${i % 13}")))
    def run(): (Set[(Long, Long, Double)], Set[(Long, Long, Double)]) = (
      Dedup.jaccardPairs(docs, col("text"), col("doc_id"), 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet,
      Dedup.containmentPairs(docs, col("text"), col("doc_id"), 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
    val (jDefault, cDefault) = run()
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val (jSmj, cSmj) = run()
      assert(jSmj === jDefault, "jaccard pairs differ between join regimes")
      assert(cSmj === cDefault, "containment pairs differ between join regimes")
      assert(jDefault.nonEmpty && cDefault.nonEmpty, "vacuous fixture")
    } finally spark.conf.set(key, old)
  }

  test("containmentPairs: full quote scores 1.0 forward, small backward; directions independent") {
    // doc 1 is entirely contained in doc 2 (8 extra words around it):
    // C(1->2) = 1.0, C(2->1) = 4/12 — only the forward direction passes
    val a = "a b c d e f" // 4 shingles, all present in b
    val b = "p q r a b c d e f x y z w v" // 12 shingles
    val df = docsDf(Seq((1L, a), (2L, b)))
    val out = Dedup.containmentPairs(df, col("text"), col("doc_id"), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
    // at a permissive threshold both directions emerge with their own scores
    val both = Dedup.containmentPairs(df, col("text"), col("doc_id"), 0.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(both((1L, 2L)) == 1.0)
    assert(math.abs(both((2L, 1L)) - 4.0 / 12.0) < 1e-4 + 1e-9)
  }

  test("editDistancePairs: prefix-blocked, length-windowed, threshold-verified") {
    val p = "0123456789abcdef" // exactly prefixLen chars
    val df = docsDf(Seq(
      (1L, p + "X" * 25),             // pairs with 2 at dist 1
      (2L, p + "X" * 24 + "Y"),
      (3L, p + "Y" * 25),             // dist 25/24 from 1/2 — past maxDist
      (4L, "different prefix" + "X" * 25), // own block, alone
      (5L, p + "XXX")))               // len diff 22 — outside the window
    val out = Dedup.editDistancePairs(df, col("text"), col("doc_id"))
      .orderBy("a", "b").as[(Long, Long, Int)].collect().toSeq
    assert(out === Seq((1L, 2L, 1)), out.toString)
    // the hot-block guard drops oversize blocks whole
    assert(Dedup.editDistancePairs(df, col("text"), col("doc_id"),
      maxBlock = 1L).count() === 0L)
  }

  test("brute-force topK cosine: self is rank 1 with score 1.0") {
    val emb = Tables.embeddings(spark, sf)
    val top = Similarity.topKCosine(emb, emb.filter($"vec_id" === 0), 5).collect()
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    // scores non-increasing
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("boilerplatePhrases: cross-doc phrase flagged; one-doc spam never qualifies; short docs excluded") {
    val shared = "all rights reserved contact us"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),          // 8 tokens → 4 grams
      (2L, s"$shared delta epsilon zeta"),
      (3L, s"eta theta iota $shared"),
      // doc 4 spams ITS OWN phrase 3 times — must NOT become boilerplate
      (4L, "spam phrase here again now spam phrase here again now spam phrase here again now"),
      (5L, "tiny doc")                            // < 5 tokens → excluded
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplatePhrases(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(!out.contains(5L), "sub-5-token docs carry no grams")
    // the shared 5-token phrase contributes exactly ONE boilerplate gram
    // occurrence per doc that contains it
    assert(out(1L)._2 == 1L && out(2L)._2 == 1L && out(3L)._2 == 1L,
      s"shared phrase must flag once per doc: $out")
    assert(out(4L)._2 == 0L,
      s"a phrase repeated only WITHIN one doc is not boilerplate: $out")
    // gram totals: tokens − 4
    assert(out(1L)._1 == 4L && out(4L)._1 == 11L)
  }

  test("MMR rerank: planted near-duplicates are diversified; λ=10 degenerates to top-k") {
    // query = e1; ids 1,2,3 EXACT clones of it (sim 1.0 to q and to each
    // other); ids 4,5 distinct unit directions at lower relevance. Plain
    // top-4 = {0,1,2,3}; MMR at λ=0.4 (score = 4·qs − 6·pen micro-units:
    // clone −20000 vs id4 −16000 vs id5 −12000 after one clone is in)
    // must keep ONE clone and pull in both distinct directions.
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val emb = Seq(
      (0L, v(1, 0, 0, 0)),   // the query itself
      (1L, v(1, 0, 0, 0)),
      (2L, v(1, 0, 0, 0)),
      (3L, v(1, 0, 0, 0)),
      (4L, v(0.8, 0, 0.6, 0)),
      (5L, v(0.6, 0, 0, 0.8))
    ).toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 0L)
    val got = Similarity.mmrRerank(emb, q, k = 4, pool = 6, lambdaTenths = 4)
      .select("mmr_rank", "vec_id").as[(Int, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(1, 2, 3, 4))
    // rank 1: argmax qs, smallest-id tie-break → the query itself; then
    // the distinct directions beat the remaining clones (id5 before id4:
    // with the penalty weighted over relevance, the LESS query-similar
    // direction nets more — 4·6000−6·6000 = −12000 vs −16000); the last
    // slot falls back to a clone (everything else exhausted)
    assert(got.map(_._2) == Seq(0L, 5L, 4L, 1L), s"selection order: $got")
    val picked = got.map(_._2).toSet
    assert(picked.intersect(Set(1L, 2L, 3L)).size == 1,
      s"MMR must keep exactly one clone beyond the query, got $got")
    // λ = 10 (no diversity term) reproduces plain top-k order
    val pure = Similarity.mmrRerank(emb, q, k = 4, pool = 6, lambdaTenths = 10)
      .select("vec_id").as[Long].collect().toSeq
    val topk = Similarity.topKCosine(emb, q, 4).select("vec_id").as[Long].collect().toSeq
    assert(pure == topk, s"λ=1 MMR must equal top-k: $pure vs $topk")
  }

  test("ANN results are a subset of the corpus ranked consistently with brute force") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0)
    val ann = Similarity.annTopK(emb, q, 10, bits = 4).collect()
    assert(ann.nonEmpty && ann.head.getLong(0) == 0L) // query shares its own bucket
    val brute = Similarity.topKCosine(emb, q, 2000).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach(r => assert(math.abs(brute(r.getLong(0)) - r.getDouble(1)) < 1e-9))
  }

  test("multi-probe ANN recall dominates single-probe and agrees with brute force") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0)
    val k = 10
    val truth = Similarity.topKCosine(emb, q, k).collect().map(_.getLong(0)).toSet
    val single = Similarity.annTopK(emb, q, k, bits = 4).collect().map(_.getLong(0)).toSet
    val multi = Similarity.annTopKMultiProbe(emb, q, k, bits = 4).collect()
    val multiIds = multi.map(_.getLong(0)).toSet
    // probing a superset of buckets can only widen the candidate pool
    assert((multiIds intersect truth).size >= (single intersect truth).size)
    assert(multi.head.getLong(0) == 0L) // self always recovered
    // scores are exact rescored cosines — identical to brute force values
    val brute = Similarity.topKCosine(emb, q, 2000).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    multi.foreach(r => assert(math.abs(brute(r.getLong(0)) - r.getDouble(1)) < 1e-9))
  }

  test("IVF ANN: self found; scores agree with brute force; full-probe == exact top-k") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0)
    val ivf = Similarity.ivfTopK(emb, q, 10, nCentroids = 16, nProbe = 4).collect()
    assert(ivf.nonEmpty && ivf.head.getLong(0) == 0L)
    val brute = Similarity.topKCosine(emb, q, 500).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach(r => assert(math.abs(brute(r.getLong(0)) - r.getDouble(1)) < 1e-9))
    // probing every cell must recover the exact brute-force top-k
    val full = Similarity.ivfTopK(emb, q, 10, nCentroids = 16, nProbe = 16).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Similarity.topKCosine(emb, q, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == exact)
  }

  test("near-dedup pipeline: exact duplicates share a cluster; counts partition the corpus") {
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()
    val summary = QueriesLLM.pipelineNearDedup(spark, sf)
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    // kept + deduped == corpus, and at least the fixture's planted exact
    // dups must be deduped (identical text ⇒ identical signature ⇒
    // est_jaccard 1 ≥ 0.8 ⇒ same component)
    assert(summary.values.sum == nDocs)
    val exactDupRow = Dedup.exact(docs, col("text"), col("doc_id"))
      .filter(col("n_dups") > 1)
      .agg(sum(col("n_dups") - 1)).head()
    val exactDupDocs = if (exactDupRow.isNullAt(0)) 0L else exactDupRow.getLong(0)
    assert(summary.getOrElse(false, 0L) >= exactDupDocs,
      s"deduped ${summary.get(false)} < planted exact-dup surplus $exactDupDocs")
  }

  test("kNN graph: per-source recall vs brute force; scores exact; k respected") {
    val emb = Tables.embeddings(spark, sf)
    val knn = Similarity.knnGraph(emb, 5, bands = 16, bitsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val bySrc = knn.groupBy(_._1)
    assert(bySrc.values.forall(_.length <= 5))
    // brute-force truth for a deterministic sample of sources
    val sample = bySrc.keys.toSeq.sorted.take(20)
    var hit = 0; var total = 0
    sample.foreach { src =>
      val truth = Similarity.topKCosine(emb, emb.filter(col("vec_id") === src), 6)
        .collect().map(_.getLong(0)).filter(_ != src).take(5).toSet
      val got = bySrc(src).map(_._2).toSet
      hit += got.count(truth); total += truth.size
    }
    assert(hit.toDouble / total >= 0.5,
      s"kNN-graph recall $hit/$total below floor at 16x4 banding")
    // scores are EXACT cosines (rescored), spot-checked against brute force
    val (s0, d0, c0) = knn.head
    val brute = Similarity.topKCosine(emb, emb.filter(col("vec_id") === s0), 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(brute(d0) - c0) < 1e-9)
  }

  test("k-means-refined IVF: deterministic, recall not below the seed quantizer") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0)
    val c1 = Similarity.ivfCentroidsKmeans(emb, 16, iters = 3)
    val c2 = Similarity.ivfCentroidsKmeans(emb, 16, iters = 3)
    // fully deterministic: same centroids bit-for-bit on re-run
    assert(c1.map(_._1).sameElements(c2.map(_._1)))
    c1.zip(c2).foreach { case ((_, a), (_, b)) => assert(a.sameElements(b)) }
    val exact = Similarity.topKCosine(emb, q, 10).collect().map(_.getLong(0)).toSet
    def recall(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getLong(0)).count(exact).toDouble / exact.size
    val seedR = recall(Similarity.ivfTopK(emb, q, 10, nCentroids = 16, nProbe = 4).collect())
    val kmR = recall(Similarity.ivfTopKWith(emb, q, 10, c1, nProbe = 4).collect())
    assert(kmR >= seedR - 0.101,
      s"k-means recall $kmR fell more than a tolerance below seed recall $seedR")
    assert(kmR > 0.5, s"k-means IVF recall $kmR too low")
  }

  test("autoLshParams: n^rho sizing rule — band width log2(n), bands meet recall, loose-tau cap") {
    // band width follows ceil(log2 n), floored at 4
    assert(Similarity.autoLshParams(16, 0.8).bitsPerBand == 4)
    assert(Similarity.autoLshParams(2000, 0.8).bitsPerBand == 11)
    assert(Similarity.autoLshParams(4000, 0.8).bitsPerBand == 12)
    // uncapped band count satisfies the recall identity 1-(1-p1^r)^b >= target
    for (n <- Seq(500L, 2000L, 20000L); tau <- Seq(0.8, 0.9)) {
      val p = Similarity.autoLshParams(n, tau)
      val p1 = 1.0 - math.acos(tau) / math.Pi
      val recall = 1.0 - math.pow(1.0 - math.pow(p1, p.bitsPerBand), p.bands)
      assert(p.bands < 96 && recall >= 0.9 - 1e-9,
        s"n=$n tau=$tau -> $p recall $recall")
    }
    // bands grow with n (the n^rho law) while width tracks log2 n
    assert(Similarity.autoLshParams(100000L, 0.8).bands >
      Similarity.autoLshParams(500L, 0.8).bands)
    // LOOSE tau: required bands explode past the cap — the documented
    // "LSH cannot prune this regime" signal
    assert(Similarity.autoLshParams(1L << 20, 0.35).bands == 96)
    // multi-word packing: a band never straddles words, words cover all bands
    val mp = Similarity.autoLshParams(4000, 0.8) // e.g. 12-bit bands
    assert(mp.bands * mp.bitsPerBand > 64, "fixture case should need >1 word")
    assert(mp.bandsPerWord == 64 / mp.bitsPerBand)
    assert(mp.words == (mp.bands + mp.bandsPerWord - 1) / mp.bandsPerWord)
  }

  test("sim_pairs_lsh (auto-sized primary) == exact pairs on the planted near-dup corpus (multi-word sketches)") {
    // the registered query plants a deterministic twin per vector; at the
    // auto-sized worst-case-tau banding the per-pair miss probability is
    // ~1e-43, so LSH output must EQUAL the exact form — the property that
    // lets the row be oracle-gated (QueriesLLM.simPairsLsh doc)
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val twins = emb.select(($"vec_id" + 1000000L).as("vec_id"),
      transform($"embedding", x => x + lit(0.015625f)).as("embedding"))
    val u = emb.unionAll(twins)
    val lsh = QueriesLLM.all("sim_pairs_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exact = Similarity.pairsAboveThreshold(u, 0.8)
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(exact.nonEmpty, "planted twins must produce pairs")
    assert(lsh == exact, s"LSH(${lsh.size}) != exact(${exact.size})")
    // every planted twin pair recovered, nothing else crosses tau=0.8
    assert(exact.size == emb.count(),
      s"expected one pair per vector, got ${exact.size}")
    // determinism across runs
    val again = QueriesLLM.all("sim_pairs_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(again == lsh)
  }

  test("kNN graph via IVF cells: recall vs brute force, scores exact, k respected, deterministic") {
    val emb = Tables.embeddings(spark, sf)
    val nCells = math.max(8L, emb.count() / 128L).toInt
    val knn = Similarity.knnGraphIvf(emb, 5, nCells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val bySrc = knn.groupBy(_._1)
    assert(bySrc.values.forall(_.length <= 5))
    // every vector appears as a source (its cell has >= 2 members at
    // this cell size), and neighbors are cell-local candidates only
    assert(bySrc.size.toLong == emb.count(),
      s"${bySrc.size} sources for ${emb.count()} vectors")
    // per-source recall vs brute-force truth on a deterministic sample
    val sample = bySrc.keys.toSeq.sorted.take(20)
    var hit = 0; var total = 0
    sample.foreach { src =>
      val truth = Similarity.topKCosine(emb, emb.filter(col("vec_id") === src), 6)
        .collect().map(_.getLong(0)).filter(_ != src).take(5).toSet
      val got = bySrc(src).map(_._2).toSet
      hit += got.count(truth); total += truth.size
    }
    assert(hit.toDouble / total >= 0.4,
      s"IVF kNN-graph recall $hit/$total below floor at n/128 cells")
    // emitted scores are EXACT rescored cosines
    val (s0, d0, c0) = knn.head
    val brute = Similarity.topKCosine(emb, emb.filter(col("vec_id") === s0), 2000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(brute(d0) - c0) < 1e-9)
    // deterministic (k-means seed + argmax ties are all deterministic)
    val again = Similarity.knnGraphIvf(emb, 5, nCells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.sorted.toSeq == knn.sorted.toSeq)
  }

  test("incremental minhash: re-sent state content caught with certainty, batch-complete, precise") {
    val docs = Tables.documents(spark, sf)
    val out = QueriesLLM.all("dedup_incremental_minhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
    // one row per batch doc (the %5>=2 slice + 10 planted re-sends)
    val nBatch = docs.filter(col("doc_id") % 5 >= 2).count() + 10
    assert(out.length.toLong == nBatch)
    // planted re-sends: identical text => identical signature => est 1.0,
    // flagged with certainty (no banding probability involved)
    val resent = out.filter(_._1 >= 1000000L)
    assert(resent.length == 10)
    assert(resent.forall(_._2), s"missed re-sends: ${resent.filterNot(_._2).map(_._1).toSeq}")
    assert(resent.forall(_._4 == 1.0))
    // precision: every flagged row's estimate recomputes identically from
    // the two signature frames (the operator reported real agreement)
    val stateSigs = Dedup.minhashSignatures(
      docs.filter(col("doc_id") % 5 < 2), col("text"), col("doc_id"))
    val resendDocs = docs.filter(col("doc_id") % 5 < 2).orderBy("doc_id").limit(10)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
    val batchDocs = docs.filter(col("doc_id") % 5 >= 2)
      .select(col("doc_id"), col("text")).unionAll(resendDocs)
    val allSigs = stateSigs.unionAll(
      Dedup.minhashSignatures(batchDocs, col("text"), col("doc_id")))
    val flagged = out.filter(_._2)
    assert(flagged.nonEmpty)
    val cands = flagged.map(f => (f._1, f._3)).toSeq.toDF("a_id", "b_id")
    val recomputed = Dedup.verifyFromSignatures(cands, allSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    flagged.foreach { f =>
      assert(recomputed((f._1, f._3)) == f._4, s"estimate mismatch for $f")
      assert(f._4 >= 0.8)
    }
  }

  test("incremental minhash: viral state bucket capped by maxStateDf without losing detection") {
    val viral = "the same viral chain letter text forwarded again and again"
    val state = (0 until 100).map(i => (i.toLong, viral)).toDF("doc_id", "text")
    val stateSigs = Dedup.minhashSignatures(state, col("text"), col("doc_id"))
    val batch = Seq((5000L, viral), (5001L, "completely unrelated fresh content with new words"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalMinhash(batch, stateSigs, col("text"), col("doc_id"),
        threshold = 0.8, maxStateDf = 2)
      .orderBy("doc_id").collect()
    // the batch copy of the viral text is still caught (identical band
    // hashes collide with the 2 surviving family members) and matched to
    // the family minimum; the fresh doc passes
    assert(out(0).getLong(0) == 5000L && out(0).getBoolean(1))
    assert(out(0).getLong(2) == 0L)
    assert(out(1).getLong(0) == 5001L && !out(1).getBoolean(1))
    assert(out(1).isNullAt(2))
  }

  test("incrementalMinhash state-cap miss rate: measured on a near-threshold family (round-10, verdict ask #5)") {
    // A planted family of 20 near-variants (pairwise J≈0.90, so they
    // flood shared LSH buckets) and 4 batch docs whose ONLY
    // above-threshold match (J≈0.815, just over τ=0.8) is a HIGH-id
    // family member — exactly the row the df-cap truncates first. The
    // cap keeps each bucket's LOWEST ids (so the min-id star
    // representative the r9 verdict suggested probing is already
    // retained by construction); the measured miss is the residual:
    // batch docs whose closest variant is NOT among the kept ids and
    // whose estimates vs the kept members (J≈0.735) fall below τ.
    // Fully deterministic (no RNG anywhere in the chain).
    val base = (0 until 120).map(i => s"w$i").toArray
    def variant(text: Array[String], edits: Seq[(Int, String)]): String = {
      val a = text.clone()
      edits.foreach { case (p, w) => a(p) = w }
      a.mkString(" ")
    }
    // members 0..19 each change one slot from the 0-mod-6 grid (spacing
    // >= 3 keeps shingle losses disjoint): pairwise J = 112/124 ≈ 0.90
    val members = (0 until 20).map(i => (i.toLong, variant(base, Seq(6 * i -> s"m$i"))))
    // batch doc t targets member 16+t: 4 extra edits on the 3-mod-6 grid
    // (disjoint from every member slot) → J(batch_t, member_{16+t}) =
    // 106/130 ≈ 0.815 (just above τ); vs any other member ≈ 100/136 ≈ 0.735
    val batchRows = (0 until 4).map { t =>
      val tgt = members(16 + t)._2.split(" ")
      (100L + t, variant(tgt, (0 until 4).map(j => (3 + 6 * (4 * t + j)) -> s"b${t}_$j")))
    }
    val state = members.toDF("doc_id", "text")
    val stateSigs = Dedup.minhashSignatures(state, col("text"), col("doc_id"))
      .localCheckpoint(true)
    val batch = batchRows.toDF("doc_id", "text")
    def detected(cap: Int): Set[Long] =
      Dedup.incrementalMinhash(batch, stateSigs, col("text"), col("doc_id"),
          threshold = 0.8, maxStateDf = cap)
        .filter(col("is_dup")).collect().map(_.getLong(0)).toSet
    val caps = Seq(1, 2, 4, 8, 12, 16, 20)
    val truth = detected(1000000) // uncapped ground truth
    assert(truth.nonEmpty, "uncapped run must detect the planted near-dups")
    val table = caps.map(c => c -> detected(c))
    info(s"uncapped detects ${truth.size}/4 planted near-threshold dups")
    table.foreach { case (c, d) =>
      info(f"cap=$c%3d  recall=${d.size.toDouble / truth.size}%.2f  (${d.size}/${truth.size})")
    }
    // recall is monotone in the cap (larger cap keeps a per-bucket
    // superset of lowest ids → candidate and estimate sets are supersets)
    table.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(a.subsetOf(b), s"cap recall must be monotone: $a vs $b")
    }
    // the boundary miss is REAL: some small cap loses a dup uncapped finds
    assert(table.head._2.size < truth.size,
      "cap=1 should demonstrate the threshold-boundary miss")
    // and a cap >= family size is lossless
    assert(table.last._2 == truth)
  }

  test("dedup_simhash_exact: output == identical-text pair set, twins detected (round-9 gate)") {
    val got = QueriesLLM.all("dedup_simhash_exact")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs0 = Tables.documents(spark, sf).select("doc_id", "text")
    val u = docs0.unionAll(docs0.select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
    val dig = u.select($"doc_id", md5(lower(trim($"text"))).as("d"))
    val want = dig.as("a").join(dig.as("b"),
        $"a.d" === $"b.d" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "planted twins must produce pairs")
    assert(got == want, s"simhash-exact ${got.size} pairs != digest ${want.size}")
    // every planted twin pair is present (Hamming 0 by construction)
    val n = docs0.count()
    assert(got.count { case (a, b) => b == a + 1000000L } == n)
  }

  test("ANN twins gates: top-2 is {query, twin} at cosine 1.0 for all three variants (round-9 gates)") {
    for (q <- Seq("sim_ann_lsh_twins", "sim_ann_multiprobe_twins", "sim_ann_ivf_twins")) {
      val rows = QueriesLLM.all(q)(spark, sf)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows == Seq((0L, 1.0), (1000000L, 1.0)),
        s"$q returned $rows — the bit-identical twin must be in-bucket/in-cell")
    }
  }

  test("text_fingerprint_dedup: twins collapse to their base doc, distinct docs never merge (round-9 gate)") {
    val rows = QueriesLLM.all("text_fingerprint_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, keep) =>
      val want = if (id >= 1000000L) id - 1000000L else id
      assert(keep == want, s"doc $id kept by $want expected, got $keep")
    }
  }

  test("sketch_source_sim estimate tracks the exact per-source Jaccard (round-9 exact sibling)") {
    val est = QueriesLLM.all("sketch_source_sim")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val exact = QueriesLLM.all("sketch_source_sim_exact")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(exact.keySet == est.keySet)
    // 64-perm MinHash Jaccard stderr is sqrt(J(1-J)/64) <= 0.0625; 0.25
    // is a 4-sigma-plus envelope across every source pair
    exact.foreach { case (k, j) =>
      assert(math.abs(est(k) - j) <= 0.25, s"pair $k: est ${est(k)} vs exact $j")
    }
  }

  test("pairsAboveThreshold agrees with cross-join ground truth at small n") {
    val emb = Tables.embeddings(spark, sf).filter($"vec_id" < 60)
    val got = Similarity.pairsAboveThreshold(emb, 0.2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = emb.select($"vec_id".as("ai"), $"embedding".as("ae"))
    val b = emb.select($"vec_id".as("bi"), $"embedding".as("be"))
    val want = a.crossJoin(b).filter($"ai" < $"bi")
      .select($"ai", $"bi",
        graft.functions.Num.r4(graft.functions.VectorOps.cosine($"ae", $"be")).as("c"))
      .filter($"c" >= 0.2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }
}

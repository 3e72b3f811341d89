package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.{Contamination, Sampling}

/** Unit coverage for the round-3 curation operators (each is also
  * oracle-gated end-to-end): URL canonicalization, benchmark
  * decontamination, mixture sampling. */
class CurationOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("curate_source_hhi: bounds, inverse identity, and a hand recount on the fixture") {
    val out = QueriesLLM.all("curate_source_hhi")(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (lang, nSrc, nDocs, num, hhi, eff) =>
      assert(hhi >= 1.0 / nSrc - 1e-8 && hhi <= 1.0 + 1e-8, s"$lang hhi $hhi")
      assert(eff <= nSrc + 1e-6 && eff >= 1.0 - 1e-8, s"$lang eff $eff")
      assert(math.abs(hhi * eff - 1.0) < 1e-6, s"$lang hhi*eff") // r8 grid slack
      assert(num >= nDocs, s"$lang: sum c^2 >= sum c") // c >= 1 per source
    }
    // hand recount for one lang straight off the raw table
    val (lang0, nSrc0, nDocs0, num0, _, _) = out.minBy(_._1)
    val counts = Tables.documents(spark, sf).filter(col("lang") === lang0)
      .groupBy("source").count().as[(String, Long)].collect().map(_._2)
    assert(counts.length.toLong === nSrc0)
    assert(counts.sum === nDocs0)
    assert(counts.map(c => c * c).sum === num0)
  }

  test("curate_source_entropy: bounds, ln-vs-HHI ordering, hand recount on the fixture") {
    val out = QueriesLLM.all("curate_source_entropy")(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (lang, nSrc, nDocs, hNum, h, ppl) =>
      assert(h >= -1e-8 && h <= math.log(nSrc.toDouble) + 1e-6, s"$lang H $h")
      assert(ppl >= 1.0 - 1e-6 && ppl <= nSrc + 1e-4, s"$lang ppl $ppl")
      assert(math.abs(ppl - math.exp(h)) < 1e-6, s"$lang exp identity")
      assert(hNum >= 0, s"$lang h_num") // ln N >= weighted mean of ln c
      // hand recount straight off the raw table with the same micro grid
      val counts = Tables.documents(spark, sf).filter(col("lang") === lang)
        .groupBy("source").count().as[(String, Long)].collect().map(_._2)
      def lnm(x: Long) = math.floor(math.log(x.toDouble) * 1e8 + 0.5).toLong
      val want = lnm(counts.sum) * counts.sum - counts.map(c => c * lnm(c)).sum
      assert(want === hNum, s"$lang hand h_num")
    }
  }

  test("curate_quality_ensemble: ranks are per-source permutations; borda recomputed driver-side") {
    val out = QueriesLLM.all("curate_quality_ensemble")(spark, sf)
      .as[(Long, String, Long, Long, Long, Int, Int, Int, Long)]
      .collect().toSeq
    assert(out.nonEmpty)
    val bySrc = out.groupBy(_._2)
    bySrc.foreach { case (src, rows) =>
      val n = rows.size
      // each rank column is a 1..n permutation within the source
      assert(rows.map(_._6).sorted === (1 to n), s"$src r1")
      assert(rows.map(_._7).sorted === (1 to n), s"$src r2")
      assert(rows.map(_._8).sorted === (1 to n), s"$src r3")
      // driver-side rank replay on the emitted integer signals
      val want1 = rows.sortBy(r => (-r._3, r._1)).map(_._1)
        .zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      rows.foreach(r => assert(r._6 === want1(r._1), s"$src r1 of ${r._1}"))
      rows.foreach(r => assert(r._9 === r._6.toLong + r._7 + r._8))
    }
  }

  test("canonicalizeUrl collapses case/port/utm/slash noise to one form") {
    val urls = Seq(
      "https://data.example.org/c/7",
      "HTTPS://DATA.EXAMPLE.ORG/c/7",
      "https://data.example.org:443/c/7",
      "https://data.example.org/c/7/?utm_source=feed",
      "https://data.example.org/c/7?utm_campaign=x&utm_source=feed"
    ).toDF("url")
    val canon = urls.select(TextOps.canonicalizeUrl($"url").as("c"))
      .distinct().collect().map(_.getString(0))
    assert(canon.toSeq == Seq("https://data.example.org/c/7"))
  }

  test("canonicalizeUrl is idempotent and preserves non-noise query params") {
    val df = Seq("https://Data.Example.org/p?id=5&utm_medium=m").toDF("url")
    val once = df.select(TextOps.canonicalizeUrl($"url").as("c"))
    val twice = once.select(TextOps.canonicalizeUrl($"c").as("c"))
    assert(once.head().getString(0) == "https://data.example.org/p?id=5")
    assert(twice.head().getString(0) == once.head().getString(0))
  }

  test("canonicalizeUrl handles a LEADING utm param without leaving a dangling '&'") {
    // utm-first and utm-last orderings of the same logical URL must
    // collapse to the same canonical key
    val urls = Seq(
      "https://a.com/p?utm_source=x&id=1",
      "https://a.com/p?id=1&utm_source=x",
      "https://a.com/p?id=1"
    ).toDF("url")
    val canon = urls.select(TextOps.canonicalizeUrl($"url").as("c"))
      .distinct().collect().map(_.getString(0))
    assert(canon.toSeq == Seq("https://a.com/p?id=1"))
  }

  test("canonicalizeUrl leaves a literal path '&' (no query) untouched — ADVICE r8") {
    // 'a.com/x&y' (path ampersand, legal in real crawls) and 'a.com/x?y'
    // (a genuine query) are DISTINCT documents and must not merge
    val df = Seq(
      "https://a.com/x&y",
      "https://a.com/x?y",
      "https://a.com/a?b&c",          // query with inner '&': both params kept
      "https://a.com/p&q?utm_source=x" // path '&' plus an all-utm query
    ).toDF("url")
    val canon = df.select(TextOps.canonicalizeUrl($"url").as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(canon == Seq(
      "https://a.com/x&y",
      "https://a.com/x?y",
      "https://a.com/a?b&c",
      "https://a.com/p&q"))
  }

  test("canonicalizeUrlSorted: param order collapses, path untouched, idempotent (round 9)") {
    val df = Seq(
      "https://a.com/r?b=2&a=1",        // reordered ...
      "https://a.com/r?a=1&b=2",        // ... baseline: must merge
      "https://a.com/r?a=1&utm_source=x&b=2", // utm stripped BEFORE sorting
      "https://a.com/x&y",              // path '&', no query: untouched
      "https://a.com/r",                // no query
      "https://a.com/r?single=1"        // one param: sort is a no-op
    ).toDF("url")
    val canon = df.select(TextOps.canonicalizeUrlSorted($"url").as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(canon == Seq(
      "https://a.com/r?a=1&b=2",
      "https://a.com/r?a=1&b=2",
      "https://a.com/r?a=1&b=2",
      "https://a.com/x&y",
      "https://a.com/r",
      "https://a.com/r?single=1"))
    // idempotent: a sorted canonical form maps to itself
    val twice = df.select(TextOps.canonicalizeUrlSorted(
        TextOps.canonicalizeUrlSorted($"url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == canon)
  }

  test("contamination flags exactly the docs sharing an n-gram with the benchmark") {
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("id", "txt")
    val corpus = Seq(
      (10L, "he saw the quick brown fox jumps over a fence"), // shares 5-grams
      (11L, "entirely different words with no overlap at all"),
      (12L, "quick brown fox jumps over")                      // exactly one 5-gram
    ).toDF("id", "txt")
    val got = Contamination.flagged(corpus, bench, col("txt"), col("id"), n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 10: "the quick brown fox jumps" + "quick brown fox jumps over" = 2 hits
    assert(got == Map(10L -> 2L, 12L -> 1L))
  }

  test("contamination: benchmark gram set is broadcast (corpus side not shuffled before the join)") {
    val bench = Seq((1L, "a b c d e f")).toDF("id", "txt")
    val corpus = Seq((2L, "a b c d e g")).toDF("id", "txt")
    val plan = Contamination.flagged(corpus, bench, col("txt"), col("id"), n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("mixtureSample approximates the per-source target rates and is deterministic") {
    val df = (1L to 4000L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val rates = Seq("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.25)
    val kept = Sampling.mixtureSample(df, $"id", $"src", rates, default = 0.1)
    val bySrc = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 candidates per source; md5 is uniform, so ±~15% absolute slack
    def frac(s: String) = bySrc.getOrElse(s, 0L) / 1000.0
    assert(math.abs(frac("src0") - 0.8) < 0.1, bySrc)
    assert(math.abs(frac("src1") - 0.5) < 0.1, bySrc)
    assert(math.abs(frac("src2") - 0.25) < 0.1, bySrc)
    assert(math.abs(frac("src3") - 0.1) < 0.1, bySrc)
    // determinism: the same rows are kept on re-run and under repartition
    val again = Sampling.mixtureSample(df.repartition(7), $"id", $"src", rates, 0.1)
    assert(kept.select("id").collect().map(_.getLong(0)).toSet ==
      again.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("curate_dsir: target-exclusive tokens score positive, raw-exclusive negative; partition-proof (round 9)") {
    import graft.operators.Dsir
    // 4 target docs of 3×"alpha", 4 raw docs of 3×"beta": the alpha
    // bucket is target-enriched (ln ratio > 0), beta target-absent
    // (ln ratio < 0); each doc's score is 3 × its bucket's unit weight.
    val docs = ((1L to 4L).map(i => (i, true, "alpha alpha alpha")) ++
        (5L to 8L).map(i => (i, false, "beta beta beta"))).toDF("id", "t", "text")
    val out = Dsir.scores(docs, col("id"), col("t"),
        TextOps.tokens(col("text"))).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) === (1L to 8L), out.toString)
    assert(out.forall(_._2 === 3L), out.toString)
    out.foreach { case (id, _, micro, score) =>
      if (id <= 4) assert(micro > 0L && score > 0.0, s"$id: $micro")
      else assert(micro < 0L && score < 0.0, s"$id: $micro")
      assert(math.abs(score - micro / 1e8) < 1e-12)
    }
    // identical target docs share one exact integer score (and raw ditto)
    assert(out.take(4).map(_._3).distinct.size === 1)
    assert(out.drop(4).map(_._3).distinct.size === 1)
    // merge-order-proof: same micros under a different partitioning
    val re = Dsir.scores(docs.repartition(7), col("id"), col("t"),
        TextOps.tokens(col("text"))).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(re === out)
  }

  test("sample_stratified_exact: exact per-stratum quota, small strata whole, repartition-proof (round 9)") {
    val out = QueriesLLM.all("sample_stratified_exact")(spark, sf)
      .as[(String, Long, Int)].collect().toSeq
    val byLang = out.groupBy(_._1)
    val sizes = Tables.documents(spark, sf).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    byLang.foreach { case (lang, rows) =>
      assert(rows.size === math.min(50L, sizes(lang)).toInt, lang)
      assert(rows.map(_._3).sorted === (1 to rows.size), s"$lang ranks")
    }
    assert(byLang.keySet === sizes.keySet) // every stratum represented
  }

  test("sample_reservoir_weighted: exact k, weight bias, deterministic re-run (round 9)") {
    val q = QueriesLLM.all("sample_reservoir_weighted")
    val out = q(spark, sf)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out.size === 100)
    assert(out.map(_._1) === (1 to 100), "ranks dense and ordered")
    // keys are ordered desc with the doc_id tie-break
    assert(out.sliding(2).forall { case Seq(a, b) =>
      a._4 > b._4 || (a._4 == b._4 && a._2 < b._2) })
    // weight-proportional: the sample over-represents long docs
    // (fixture-deterministic: 366.1 vs corpus mean 306.3 at sf0.001)
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg("n_chars")).as[Double].head()
    val sampleMean = out.map(_._3).sum.toDouble / out.size
    assert(sampleMean > corpusMean, s"$sampleMean !> $corpusMean")
    // same draw on re-run (pure function of the fixture)
    assert(q(spark, sf).as[(Int, Long, Long, Long)].collect().toSeq === out)
  }

  test("dq_split_leakage: crafted cross-split 8-gram counted once; short docs contribute nothing (round 9)") {
    // train and test share exactly one 8-gram; val is disjoint; the
    // 2-token doc generates no shingle (the descending-sequence guard)
    val docs = Seq(
      ("train", "a b c d e f g h i"),
      ("test", "a b c d e f g h"),
      ("val", "z1 z2 z3 z4 z5 z6 z7 z8"),
      ("val", "tiny doc")
    ).toDF("sp", "text")
    val got = QueriesLLM.splitLeakage(docs, col("sp"), col("text"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((3L, 0L, 1L, 0L)), got.toString)
  }

  test("curate_gopher_rules: each rule non-vacuous on the fixture; flags recomputed driver-side (round 9)") {
    val out = QueriesLLM.all("curate_gopher_rules")(spark, sf)
      .as[(Long, Long, Long, Long, Boolean, Boolean, Boolean, Boolean)]
      .collect().toSeq
    assert(out.nonEmpty)
    // every rule fails somewhere and passes somewhere (calibrated)
    for (sel <- Seq[((Long, Long, Long, Long, Boolean, Boolean, Boolean, Boolean)) => Boolean](
        _._5, _._6, _._7)) {
      assert(out.exists(sel) && out.exists(r => !sel(r)), "vacuous rule")
    }
    // verdicts are pure integer functions of the carried counts
    out.foreach { case (id, n, wl, st, r1, r2, r3, kept) =>
      assert(r1 === (n >= 20L && n <= 100000L), s"doc $id r1")
      assert(r2 === (wl * 2 >= n * 7 && wl <= n * 5), s"doc $id r2")
      assert(r3 === (st >= 1L), s"doc $id r3")
      assert(kept === (r1 && r2 && r3), s"doc $id kept")
    }
  }

  test("curate_ngram_ppl: hand-computed bigram cross-entropy; short docs drop (round 9)") {
    // unigrams a:3 b:3 c:1 x:1 → V=4; bigrams (a,b):3 (b,a):1 (b,c):1
    // wq(a,b) = ⌊ln(4/7)·1e8+0.5⌋ = −55961579
    // wq(b,a) = wq(b,c) = ⌊ln(2/7)·1e8+0.5⌋ = −125276297
    // doc1 [ab,ba,ab]: sum −237199455, n 3 → H = 0.79066485
    // doc2 [ab,bc]:    sum −181237876, n 2 → H = 0.90618938
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = QueriesLLM.ngramPpl(docs)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, -237199455L, 0.79066485),
      (2L, 2L, -181237876L, 0.90618938)), got.toString) // doc 3: no bigrams
  }
}

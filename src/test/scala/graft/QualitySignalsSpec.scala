package graft

import org.apache.spark.sql.functions._

/** Round-4 additions: Gopher-style repetition signals, unigram-LM
  * cross-entropy scoring, weekly cohort retention, and the CSV/ORC
  * roundtrip scans. Hand-computed expectations on crafted frames plus
  * invariants on the shared fixture.
  */
class QualitySignalsSpec extends SparkTestBase {

  import spark.implicits._

  test("pmiBigrams: hand PMI on a crafted corpus; short docs yield no bigrams; floor filters") {
    // "a b" x5 + "a b c" + "z": c_ab("a b") = 6 (the 6th from "a b c"),
    // c_ab("b c") = 1 (below the floor); N = 5*2 + 3 + 1 = 14 tokens,
    // c(a) = c(b) = 6, c(c) = 1; the single-token doc yields no bigram.
    val docs = (Seq.fill(5)("a b") ++ Seq("a b c", "z")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def r8d(x: Double) = math.floor(x * 1e8 + 0.5) / 1e8
    val out = QueriesLLM.pmiBigrams(docs)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("a b", 6L, 6L, 6L, r8d(math.log(6.0 * 14 / 36)))),
      out.toString)
    // at minCount 1 the rare bigram emerges with its own counts
    val all = QueriesLLM.pmiBigrams(docs, minCount = 1L)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(all("b c") === ("b c", 1L, 6L, 1L, r8d(math.log(14.0 / 6))))
    assert(all.size === 2)
  }

  test("tfidfKeywords: hand tf-idf on a crafted corpus; rank ties break by term") {
    // 3 docs: "rare" only in doc 0 (df=1), "mid" in docs 0+1 (df=2),
    // "common" in all (df=3 -> idf = ln(4/4) = 0 -> score 0).
    val docs = Seq(
      (0L, "common rare rare mid"),
      (1L, "common mid"),
      (2L, "common common")).toDF("doc_id", "text")
    def idfM(df: Long) = math.floor(math.log(4.0 / (df + 1)) * 1e8 + 0.5).toLong
    val out = QueriesLLM.tfidfKeywords(docs)
      .as[(Long, String, Long, Long, Long, Long, Int)].collect()
    val d0 = out.filter(_._1 == 0L).map(r => (r._2, r._3, r._4, r._6, r._7))
    // doc 0: rare tf=2 idf=ln(2) beats mid tf=1 idf=ln(4/3) beats common 0
    assert(d0 === Array(
      ("rare", 2L, 1L, 2 * idfM(1), 1),
      ("mid", 1L, 2L, idfM(2), 2),
      ("common", 1L, 3L, 0L, 3)))
    // doc 2: only "common", score 0, still ranked 1 (one term only)
    assert(out.filter(_._1 == 2L).map(r => (r._2, r._7)).toSeq ===
      Seq(("common", 1)))
    // zero-score ties break alphabetically by term
    val tied = QueriesLLM.tfidfKeywords(
      Seq((9L, "b a c"), (10L, "a b c")).toDF("doc_id", "text"))
      .filter(col("doc_id") === 9L)
      .as[(Long, String, Long, Long, Long, Long, Int)].collect()
    assert(tied.map(_._2).toSeq === Seq("a", "b", "c"))
  }

  test("textHashFeatures: buckets match a driver-side md5 replay; collisions sum") {
    def bucketOf(term: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((term + ":hf").getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.substring(0, 12)
      java.lang.Long.parseLong(hex, 16) % 64L
    }
    val docs = Seq((1L, "alpha beta alpha gamma"), (2L, "beta")).toDF("doc_id", "text")
    val out = QueriesLLM.hashFeatures(docs)
      .as[(Long, Long, Long)].collect().toSeq
    val expected = Seq(
      (1L, Seq("alpha", "alpha", "beta", "gamma")),
      (2L, Seq("beta")))
      .flatMap { case (id, ts) =>
        ts.groupBy(bucketOf).map { case (b, g) => (id, b, g.size.toLong) }
      }.sortBy(t => (t._1, t._2))
    assert(out === expected, s"got $out expected $expected")
    // a 1-bucket fold sums EVERYTHING (collision contract at its extreme)
    val folded = QueriesLLM.hashFeatures(docs, buckets = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(folded === Seq((1L, 0L, 4L), (2L, 0L, 1L)))
  }

  test("zipfFit: exact power law recovers its slope; OLS sums match brute force") {
    // counts c(r) = floor(1000/r): close to slope -1 on the log-log grid
    val words = (1 to 50).flatMap(r => Seq.fill(1000 / r)(s"w%03d".format(r)))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val row = QueriesLLM.zipfFit(docs).collect()(0)
    // brute-force replay on the same micro grid
    def q4(v: Double) = math.floor(math.log(v) * 1e4 + 0.5).toLong
    val pts = (1 to 50).map(r => (q4(r.toDouble), q4((1000 / r).toDouble)))
    val (n, sx, sy) = (pts.size.toLong, pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((n, sx, sy)))
    assert((row.getLong(5), row.getLong(6)) === ((num, den)))
    val slope = math.floor(num.toDouble / den.toDouble * 1e8 + 0.5) / 1e8
    assert(row.getAs[Double]("slope") === slope)
    assert(slope > -1.1 && slope < -0.9, s"slope $slope should be near -1")
  }

  // ---- text_repetition ----------------------------------------------------

  test("repetition metrics match a hand computation on a crafted doc") {
    // Route the registered query's exact aggregation over a tiny frame by
    // re-deriving it from TextOps.shingles — same code path as the query.
    val docs = Seq(
      (1L, "a b a b c"), // 2-grams: [a b, b a, a b, b c] -> top 2/4, dup 2/4
      (2L, "x x x x"),   // 2-grams: [x x, x x, x x]      -> top 3/3, dup 3/3
      (3L, "u v w")      // 2-grams: [u v, v w]           -> top 1/2, dup 0
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        explode(graft.functions.TextOps.shingles(col("text"), 2)).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), max("c").as("m"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("d"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 4L, 2L, 2L), (2L, 3L, 3L, 3L), (3L, 2L, 1L, 0L)))
  }

  test("repetition query on the fixture: bounds hold and doc 0 repeats") {
    val out = QueriesLLM.textRepetition(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (top, dup) = (r.getDouble(3), r.getDouble(4))
      assert(top > 0.0 && top <= 1.0, s"top_frac out of range: $r")
      assert(dup >= 0.0 && dup <= 1.0, s"dup_frac out of range: $r")
    }
    // fixture doc 0 contains "batch batch batch" -> duplicated 2-gram
    val d0 = rows.find(r => r.getLong(0) == 0L && r.getInt(1) == 2).get
    assert(d0.getDouble(4) > 0.0)
  }

  // ---- text_ngram_lm ------------------------------------------------------

  test("unigram cross-entropy: uniform corpus scores exactly ln(vocab)") {
    // 4 tokens, all distinct, one doc: H = ln N - (1/n)*sum ln 1 = ln 4
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val tok = docs.select(col("doc_id"),
      explode(graft.functions.TextOps.tokens(col("text"))).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("c"))
    val n = tok.count().toDouble
    val h = tok.join(vocab, "token").groupBy("doc_id")
      .agg((log(lit(n)) - sum(log(col("c"))) / count(lit(1))).as("h"))
      .as[(Long, Double)].head()._2
    assert(math.abs(h - math.log(4.0)) < 1e-12)
  }

  test("ngram_lm query on the fixture: positive, bounded, common < rare") {
    val out = QueriesLLM.textNgramLm(spark, sf).collect()
    assert(out.length === Tables.documents(spark, sf).count())
    val nTotal = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextOps.tokens(col("text")))).count().toDouble
    out.foreach { r =>
      val h = r.getDouble(2)
      assert(h > 0.0 && h <= math.log(nTotal) + 1e-9, s"H out of range: $r")
    }
  }

  // ---- retention_cohorts --------------------------------------------------

  test("retention: offset 0 is always 1.0 and later offsets never exceed it") {
    val rows = QueriesAnalytics.retentionCohorts(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (_, rs) =>
      val zero = rs.find(_.getLong(1) == 0L).get
      assert(zero.getDouble(4) === 1.0, s"cohort week-0 retention must be 1: $zero")
      rs.foreach { r =>
        assert(r.getLong(1) >= 0L, s"negative offset: $r")
        assert(r.getLong(2) <= r.getLong(3), s"active > cohort size: $r")
      }
    }
  }

  test("retention on a crafted frame matches the hand-computed table") {
    val wk = 604800000000000L
    val ev = Seq( // users 1,2 start week 0; user 2 returns week 1; user 3 starts week 1
      (1L, 0L * wk), (2L, 0L * wk), (2L, 1L * wk + 5L), (3L, 1L * wk),
      (1L, 0L * wk + 7L) // same-week duplicate activity collapses
    ).toDF("user_id", "ts")
    val uw = ev.select(col("user_id"), expr(s"ts div ${wk}L").as("week")).distinct()
    val cohort = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_users"))
    val out = uw.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("off"))
      .agg(count(lit(1)).as("active"))
      .join(sizes, "cohort_week")
      .orderBy("cohort_week", "off")
      .select("cohort_week", "off", "active", "cohort_users")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq((0L, 0L, 2L, 2L), (0L, 1L, 1L, 2L), (1L, 0L, 1L, 1L)))
  }

  // ---- pipeline_quality_filter -------------------------------------------

  test("quality filter: verdict counts partition every document") {
    val rows = QueriesLLM.pipelineQualityFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getLong(1)
      val parts = r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5)
      assert(parts === total, s"verdicts don't partition the docs: $r")
    }
    // the gates actually bite on the fixture: something kept, something dropped
    val kept = rows.map(_.getLong(2)).sum
    val docs = rows.map(_.getLong(1)).sum
    assert(kept > 0 && kept < docs)
  }

  // ---- plan audits --------------------------------------------------------

  test("retention pushes the purchase filter to the parquet scan") {
    val p = QueriesAnalytics.retentionCohorts(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"), p)
  }

  test("ngram_lm broadcasts the vocabulary and the 1-row total") {
    val p = QueriesLLM.textNgramLm(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p) // vocab dim join
    assert(p.contains("BroadcastNestedLoopJoin"), p) // 1-row total cross join
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("repetition is join- and aggregate-free: per-row kernel, narrow until the sort") {
    val p = QueriesLLM.textRepetition(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    // the gram counting happens inside the row — no aggregate, and the
    // only exchange is the gate ORDER BY's range partitioning
    assert(!p.contains("HashAggregate"), p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  // ---- scan roundtrips ----------------------------------------------------

  test("CSV roundtrip reproduces nation exactly") {
    val rt = QueriesCore.scanCsvRoundtrip(spark, sf).collect().toSeq
    val src = Tables.nation(spark, sf).orderBy("n_nationkey").collect().toSeq
    assert(rt === src)
  }

  test("ORC roundtrip reproduces customer exactly (doubles bit-for-bit)") {
    val rt = QueriesCore.scanOrcRoundtrip(spark, sf).collect().toSeq
    val src = Tables.customer(spark, sf).orderBy("c_custkey").collect().toSeq
    assert(rt === src)
  }

  // ---- curriculum_bins (round 9) ------------------------------------------

  test("curriculum_bins: 10 near-equal bins per source, monotone quality boundaries") {
    val rows = QueriesLLM.all("curriculum_bins")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5))) // source, bin, n, min_q, max_q
    val bySrc = rows.groupBy(_._1)
    bySrc.foreach { case (src, bins) =>
      val sorted = bins.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"$src bins not 1..k")
      // NTILE: sizes differ by at most 1
      val sizes = sorted.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$src sizes $sizes")
      // difficulty ordering: bin k's max <= bin k+1's min (ties allowed on
      // the shared grid value at the boundary)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4, s"$src: bin ${a._2} max ${a._5} > bin ${b._2} min ${b._4}")
        case _ =>
      }
    }
    // totals match the corpus
    assert(rows.map(_._3).sum == Tables.documents(spark, sf).count())
  }
}

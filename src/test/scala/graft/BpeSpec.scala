package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // the Sennrich et al. 2016 worked example (word, corpus frequency)
  private val paperCorpus = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learnMerges reproduces the paper example, hand-computed") {
    // pair counts round 1: (e,s)=9, (s,t)=9 tie -> lexicographic (e,s);
    // round 2: (es,t)=9; round 3: (l,o)=7, (o,w)=7 tie -> (l,o);
    // round 4: (lo,w)=7
    val merges = Bpe.learnMerges(paperCorpus, nMerges = 4)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3))
  }

  test("encodeWord applies merges by rank priority, not input order") {
    val ranks = Bpe.learnMerges(paperCorpus, nMerges = 4)
      .map(m => ((m.left, m.right), m.rank)).toMap
    // "lowest" never appeared in training; greedy rank order yields low|est
    assert(Bpe.encodeWord("lowest", ranks).toSeq == Seq("low", "est"))
    assert(Bpe.encodeWord("newest", ranks).toSeq == Seq("n", "e", "w", "est"))
    assert(Bpe.encodeWord("low", ranks).toSeq == Seq("low"))
    assert(Bpe.encodeWord("x", ranks).toSeq == Seq("x"))
    assert(Bpe.encodeWord("", ranks).toSeq == Seq.empty)
  }

  test("merge application is leftmost-first non-overlapping") {
    val ranks = Map(("a", "a") -> 0)
    assert(Bpe.encodeWord("aaa", ranks).toSeq == Seq("aa", "a"))
    assert(Bpe.encodeWord("aaaa", ranks).toSeq == Seq("aa", "aa"))
  }

  test("training on the fixture corpus is deterministic and bounded") {
    val docs = Tables.documents(spark, sf)
    val m1 = Bpe.train(docs, "text", nMerges = 50, maxWords = 5000)
    val m2 = Bpe.train(docs, "text", nMerges = 50, maxWords = 5000)
    assert(m1 == m2, "two training runs must learn identical merges")
    assert(m1.nonEmpty && m1.size <= 50)
    // ranks are dense from 0
    assert(m1.map(_.rank) == m1.indices)
  }

  test("encode roundtrip: concatenating a word's subwords restores the word") {
    val docs = Tables.documents(spark, sf)
    val merges = Bpe.train(docs, "text", nMerges = 50, maxWords = 5000)
    val ranks = merges.map(m => ((m.left, m.right), m.rank)).toMap
    val words = docs.select(explode(graft.functions.TextOps.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "").distinct().limit(500).as[String].collect()
    words.foreach { w =>
      assert(Bpe.encodeWord(w, ranks).mkString == w, s"roundtrip failed for '$w'")
    }
  }

  test("encode is a narrow zero-shuffle pass and compresses vs characters") {
    val docs = Tables.documents(spark, sf)
    val merges = Bpe.train(docs, "text", nMerges = 100, maxWords = 5000)
    val enc = Bpe.encode(docs, "text", merges, "bpe")
      .select(col("doc_id"), size(col("bpe")).as("n_bpe"),
        size(graft.functions.TextOps.tokens(col("text"))).as("n_ws"),
        length(regexp_replace(col("text"), "\\s", "")).as("n_chars"))
    // no exchange in the encode plan (broadcast ranks, per-row UDF)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
    val r = enc.agg(sum("n_bpe").as("b"), sum("n_ws").as("w"), sum("n_chars").as("c"))
      .head()
    val (b, w, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // merges strictly compress below character segmentation, and BPE can
    // never produce fewer tokens than whole words
    assert(b < c, s"bpe tokens ($b) must undercut character count ($c)")
    assert(b >= w, s"bpe tokens ($b) cannot undercut word count ($w)")
  }

  test("with zero merges, encode degenerates to character segmentation") {
    val docs = Tables.documents(spark, sf).limit(50)
    val enc = Bpe.encode(docs, "text", Seq.empty, "bpe")
      .select(size(col("bpe")).as("n_bpe"),
        length(regexp_replace(lower(col("text")), "\\s", "")).as("n_chars"))
    assert(enc.filter(col("n_bpe") =!= col("n_chars")).count() == 0)
  }

  test("registered queries run and agree with each other") {
    val merges = QueriesLLM.bpeMerges(spark, sf)
    assert(merges.count() > 0)
    assert(merges.columns.toSeq == Seq("rank", "left", "right", "merged"))
    val enc = QueriesLLM.bpeEncode(spark, sf)
    assert(enc.count() == Tables.documents(spark, sf).count())
    assert(enc.filter(col("n_bpe_tokens") <= 0).count() == 0)
  }

  test("bpe_encode_fixed: greedy encode under the declared table equals sequential replay") {
    // the oracle's soundness argument, asserted in-process: for every
    // distinct corpus word, rank-priority greedy == one leftmost pass
    // per merge in rank order (holds because the declared table is
    // alias-free; see QueriesLLM.fixedBpeMerges)
    val fixed = QueriesLLM.bpeEncodeFixed(spark, sf)
    val docs = Tables.documents(spark, sf)
    assert(fixed.count() == docs.count())
    val merges = Seq(
      ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"), ("l", "u"),
      ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"), ("a", "n"), ("c", "an"))
    val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    // EXACT mirror of the DuckDB oracle chain (java String.replace and
    // DuckDB replace share non-overlapping left-to-right semantics):
    // each merge's replace applied TWICE — adjacent occurrences share
    // the middle '|' and a single pass merges only occurrences 1,3,5,…
    // of a run (ADVICE r10 #2; the old single-pass mirror was exactly
    // how the 'sorcerer'-shaped gap slipped past the fixture corpus)
    def sequential(w: String): Seq[String] = {
      var s = "|" + w.map(_.toString).mkString("|") + "|"
      merges.foreach { case (l, r) =>
        s = s.replace(s"|$l|$r|", s"|$l$r|")
        s = s.replace(s"|$l|$r|", s"|$l$r|")
      }
      s.split('|').filter(_.nonEmpty).toSeq
    }
    val corpusWords = docs.select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct().collect().map(_.getString(0)).toSeq
    // adversarial shapes the fixture lacks: runs of adjacent merge
    // occurrences ('rerere'), merges re-enabled by earlier merges, and
    // every-pair chains
    val adversarial = Seq("rerere", "sorcerer", "banana", "erer", "ererer",
      "erererer", "atat", "atatat", "cancan", "cancancan", "anan", "ananan",
      "parpar", "mermer", "mermermer", "inin", "ininin", "stst", "owow",
      "luerlu", "aratan", "canatparmer")
    // pseudo-random words over the merge alphabet, fixed seed
    val rnd = new scala.util.Random(11)
    val alphabet = "aretncowslupmi"
    val fuzz = Seq.fill(400)(
      (0 until (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    (corpusWords ++ adversarial ++ fuzz).foreach { w =>
      assert(Bpe.encodeWord(w, ranks).toSeq == sequential(w),
        s"greedy != sequential replay for word '$w'")
    }
  }
}

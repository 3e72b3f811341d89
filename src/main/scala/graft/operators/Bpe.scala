package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Byte-pair-encoding tokenizer: distributed training-corpus statistics,
  * deterministic merge learning, and a broadcast-table narrow encode
  * (SURVEY.md §2.11 — replaces the `text_token_count` regex
  * approximation with a REAL trained subword tokenizer).
  *
  * Algorithm is the public BPE of Sennrich et al. 2016 ("Neural Machine
  * Translation of Rare Words with Subword Units"), GPT-2-style
  * pre-tokenization (lowercased whitespace words, no end-of-word marker;
  * merges never cross a word boundary).
  *
  * 100 TB shape — the three stages scale differently and the design
  * keeps each in its right place:
  *
  *   1. '''Word-frequency aggregation''' (scales with corpus size):
  *      explode+groupBy+count, partial-aggregated, fully distributed.
  *      This is the ONLY stage that touches every byte of the corpus.
  *   2. '''Merge learning''' (scales with vocabulary, not corpus): runs
  *      on the top-`maxWords` word/frequency table — a deliberate,
  *      ordered frequency cutoff (count desc, word asc — deterministic
  *      at the boundary), the standard practice for tokenizer training
  *      (HF `tokenizers`, SentencePiece both train on a bounded word or
  *      sentence table). The collect is bounded by construction:
  *      `maxWords` rows of (word, count). The merge loop is
  *      O(maxWords · avgWordLen · nMerges) driver-side arithmetic —
  *      milliseconds at any corpus size, because corpus size no longer
  *      appears in the bound. Running it as Spark rounds instead would
  *      pay nMerges × the scheduler floor to process a table that fits
  *      in L2 cache.
  *   3. '''Encode''' (scales with corpus size): per-row greedy merge
  *      with the learned ranks broadcast read-only to every executor —
  *      narrow, zero-shuffle, linear. A UDF rather than a codegen
  *      expression because rank-priority iterative merging is genuinely
  *      inexpressible in the builtin algebra (the §2.10 preference order
  *      bottoms out here by design).
  *
  * Determinism: no RNG anywhere; argmax ties break on the pair's
  * lexicographic order, the word-table cut ties break on the word —
  * byte-identical merges across runs, partitionings, and cluster sizes.
  */
object Bpe {

  /** One learned merge: `left`+`right` fuse into a new symbol at
    * priority `rank` (0 = learned first = applied first). */
  final case class Merge(rank: Int, left: String, right: String)

  /** Distributed word-frequency table for tokenizer training: the
    * corpus-scale aggregation stage. Top `maxWords` by (count desc,
    * word asc) — a deterministic frequency cutoff, not an error path. */
  def wordFrequencies(docs: DataFrame, textCol: String, maxWords: Int): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxWords)

  /** Learn `nMerges` BPE merges from a (word, freq) table collected from
    * [[wordFrequencies]] — the bounded, driver-side stage. Stops early
    * when the best pair's weighted count drops below `minPairCount`
    * (a pair seen once cannot generalize). */
  def learnMerges(wordFreq: Seq[(String, Long)], nMerges: Int,
      minPairCount: Long = 2L): Seq[Merge] = {
    // each word as its current symbol sequence, with its corpus frequency
    var words: Array[(Array[String], Long)] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toArray, f) }.toArray
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var continue = true
    while (continue && rank < nMerges) {
      // weighted adjacent-pair counts over the current segmentation
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        // argmax with lexicographic tie-break: deterministic regardless
        // of HashMap iteration order
        val (bestPair, bestCount) = counts.foldLeft((("", ""), -1L)) {
          case (acc @ (bp, bc), (p, c)) =>
            if (c > bc || (c == bc && pairLt(p, bp))) (p, c) else acc
        }
        if (bestCount < minPairCount) continue = false
        else {
          merges += Merge(rank, bestPair._1, bestPair._2)
          val fused = bestPair._1 + bestPair._2
          words = words.map { case (syms, f) =>
            (applyMergeOnce(syms, bestPair._1, bestPair._2, fused), f)
          }
          rank += 1
        }
      }
    }
    merges.result()
  }

  private def pairLt(a: (String, String), b: (String, String)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Replace every adjacent (left, right) with the fused symbol,
    * scanning leftmost-first (the classic non-overlapping semantics:
    * "aaa" with merge (a,a) → ["aa", "a"]). */
  private def applyMergeOnce(syms: Array[String], left: String,
      right: String, fused: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == left && syms(i + 1) == right) {
        out += fused; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Greedy rank-priority encode of one word: repeatedly merge the
    * best-ranked (lowest rank) adjacent pair present in the table, all
    * occurrences leftmost-first, until no learned pair remains — the
    * standard BPE inference algorithm (identical to HF `tokenizers`'
    * `BPE.tokenize` word loop). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        val l = syms(bi); val rsym = syms(bi + 1)
        syms = applyMergeOnce(syms, l, rsym, l + rsym)
        done = syms.length < 2
      }
    }
    syms
  }

  /** End-to-end train on a documents frame: distributed word counts →
    * bounded collect → driver merge loop. The collect is ≤ `maxWords`
    * rows by construction (see class doc, stage 2). */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 50000): Seq[Merge] = {
    val wf = wordFrequencies(docs, textCol, maxWords).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    learnMerges(wf.toSeq, nMerges)
  }

  /** The learned merge table as a DataFrame — the `bpe_merges` query
    * surface (rank, left, right, merged). */
  def mergesFrame(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.left + m.right))
      .toDF("rank", "left", "right", "merged")
  }

  /** Narrow per-row encode: broadcast the rank table once, tokenize each
    * document's words independently. Returns (input frame + `tokensCol`
    * array column). Zero shuffle; the broadcast is O(nMerges) strings. */
  // compiled once per executor (String.split would Pattern.compile the
  // regex on EVERY row of the corpus-scale encode stage)
  private val wordSplit = java.util.regex.Pattern.compile("\\s+")

  def encode(docs: DataFrame, textCol: String, merges: Seq[Merge],
      tokensCol: String): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(
      merges.map(m => ((m.left, m.right), m.rank)).toMap)
    val enc = udf { text: String =>
      if (text == null) Array.empty[String]
      else wordSplit.split(text.toLowerCase).filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, bc.value))
    }
    docs.withColumn(tokensCol, enc(col(textCol)))
  }
}

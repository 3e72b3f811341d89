package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Benchmark DECONTAMINATION — the training-data hygiene pass that flags
  * corpus documents sharing verbatim n-grams with an evaluation set, so
  * eval answers don't leak into training data.
  *
  * Scale shape: the benchmark side is tiny by nature (eval sets are
  * thousands of docs, the corpus is billions), so its distinct n-gram
  * set BROADCASTS; the corpus side stays a narrow tokenize→explode
  * projection feeding a broadcast hash join — the 100 TB corpus is
  * never shuffled. Only the matched (doc, gram) rows — a vanishingly
  * small fraction — reach the per-doc count aggregate.
  */
object Contamination {

  /** (doc_id, n_hits): corpus docs sharing ≥1 word `n`-gram with the
    * benchmark, with the count of distinct shared grams. Docs of the
    * benchmark itself should be excluded from `corpus` by the caller
    * (self-overlap is not contamination). */
  def flagged(corpus: DataFrame, benchmark: DataFrame,
      text: Column, id: Column, n: Int = 8): DataFrame = {
    val corpusGrams = TextOps.shingleRows(corpus, text, id, n)
    val benchGrams = broadcast(
      TextOps.shingleRows(benchmark, text, id, n).select("sh").distinct())
    corpusGrams.join(benchGrams, "sh")
      .groupBy("doc_id")
      .agg(countDistinct(col("sh")).as("n_hits"))
  }
}

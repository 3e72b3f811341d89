package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"): score each document
  * by the log-likelihood ratio of a TARGET token distribution against
  * the RAW corpus distribution over hashed unigram features —
  * score(d) = Σ_{w∈d} ln(p̂_t(b(w)) / p̂_r(b(w))), b = md5 bucket,
  * Laplace (+1) smoothing both sides. High scores mark raw docs that
  * "look like" the target slice; thresholding or Gumbel-top-k over the
  * scores is the resampling step (composable with
  * [[Sampling.weightedSample]]).
  *
  * Exactness: bucket counts are integers from one map-side-combined
  * aggregate; each per-bucket log-ratio is quantized ONCE to 10⁸
  * micro-units (the dq_drift_psi libm recipe), so per-doc scores are
  * merge-order-proof BIGINT sums; the reported double is one exact
  * division. Scale: tokenize narrow → B-row count aggregate → 1-row
  * totals broadcast → B-row weight table broadcast onto the token
  * stream → one map-side-combined per-doc sum. Two data-wide exchanges
  * total; the corpus is never joined wide.
  */
object Dsir {

  /** Per-doc DSIR scores: (id, n_tokens, score_micro, score). `tokens`
    * must be an array column (e.g. `TextOps.tokens`); `isTarget` marks
    * the target-distribution slice. */
  def scores(docs: DataFrame, id: Column, isTarget: Column,
      tokens: Column, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20))
    val tok = docs
      .select(id.as("__id"), isTarget.as("tgt"), explode(tokens).as("w"))
      .select(col("__id"), col("tgt"),
        (conv(substring(md5(col("w")), 1, 6), 16, 10).cast("long")
          % lit(buckets.toLong)).as("bkt"))
    val cnt = tok.groupBy("bkt").agg(
      count(lit(1)).as("c_r"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("c_t"))
    val tot = cnt.agg(sum("c_r").as("r"), sum("c_t").as("t"))
    val wt = cnt.crossJoin(broadcast(tot))
      .select(col("bkt"),
        floor(log(
          ((col("c_t") + lit(1L)).cast("double")
            / (col("t") + lit(buckets.toLong)).cast("double"))
            / ((col("c_r") + lit(1L)).cast("double")
              / (col("r") + lit(buckets.toLong)).cast("double")))
          * lit(100000000L) + lit(0.5)).cast("long").as("wq"))
    tok.join(broadcast(wt), "bkt")
      .groupBy("__id").agg(
        count(lit(1)).as("n_tokens"),
        sum("wq").as("score_micro"))
      .select(col("__id").as("doc_id"), col("n_tokens"), col("score_micro"),
        (col("score_micro").cast("double") / lit(100000000.0)).as("score"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** N-gram language identification (driver north star "text analysis").
  *
  * Classic Cavnar-Trenkle-style profile method, fully relational:
  * train = per-language top-m character-trigram profile (one groupBy +
  * one window rank); predict = explode doc trigrams, join the (small,
  * broadcast) profile, score by summed inverse-rank weight, take the
  * argmax language via `max_by`.
  *
  * Scale: the profile is ≤ langs×m rows (broadcast); prediction is one
  * explode + broadcast join + groupBy on doc_id — linear, no skew
  * (trigram fan-out is bounded by doc length).
  */
object LangId {

  /** Per-language trigram profile with inverse-rank weights. Trigram
    * extraction via the codegen explode path (TextOps.charNgramRows);
    * grams are hashed to BIGINT immediately so every downstream shuffle
    * and join key is 8 bytes, with the readable gram kept only in the
    * (tiny, broadcast) profile. */
  def train(docs: DataFrame, text: Column, lang: Column, topM: Int = 200): DataFrame = {
    val grams = TextOps.charNgramRows(docs, text, lang, 3)
      .withColumnRenamed("doc_id", "lang")
    val counts = grams.groupBy(col("lang"), col("gram")).count()
    val w = Window.partitionBy(col("lang")).orderBy(col("count").desc, col("gram").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topM)
      .select(col("lang").as("p_lang"), col("gram"),
        xxhash64(col("gram")).as("gram_h"),
        (lit(1.0) / col("rank")).as("weight"))
  }

  /** Train on the labeled corpus, then classify with a broadcast-literal
    * scoring expression: the trained profile is tiny (langs × topM rows),
    * so it is collected once — exactly what a broadcast join would ship —
    * and baked into [[graft.plans.LangScoreExpr]]. Scoring then is a
    * zero-shuffle projection: at 100 TB, classification costs one scan.
    * Training aggregates per-row distinct-trigram counts
    * ([[graft.plans.TrigramCountsExpr]]) instead of exploding every
    * occurrence — the shuffle carries distinct-per-doc rows only, and the
    * old per-doc counting shuffle disappears. Prediction semantics are
    * identical to [[selfLabelPredictRelational]] (MultimodalLangIdSpec). */
  def selfLabelPredict(docs: DataFrame, text: Column, id: Column, lang: Column,
      topM: Int = 200): DataFrame = {
    import graft.plans.LangIdExpressions
    val counts = docs.select(lang.as("lang"), LangIdExpressions.trigramCounts(text).as("tc"))
      .select(col("lang"), explode(col("tc")).as("g"))
      .groupBy(col("lang"), col("g.gram").as("gram"))
      .agg(sum(col("g.cnt")).as("count"))
    val w = Window.partitionBy(col("lang")).orderBy(col("count").desc, col("gram").asc)
    val profileRows = counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topM)
      .select(col("lang"), col("gram"), (lit(1.0) / col("rank")).as("weight"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val profile = LangIdExpressions.buildProfile(profileRows)
    docs.select(id.as("doc_id"), LangIdExpressions.langScore(text, profile).as("pred_lang"))
      .filter(col("pred_lang").isNotNull)
  }

  /** The fully-relational formulation (one shared trigram explode feeding
    * both the profile aggregate and per-doc counts, broadcast profile
    * join, two aggregate shuffles) — kept as the cross-check baseline for
    * the broadcast-literal scoring path. */
  def selfLabelPredictRelational(docs: DataFrame, text: Column, id: Column, lang: Column,
      topM: Int = 200): DataFrame = {
    val s = docs.select(id.as("doc_id"), lang.as("lang"), lower(text).as("__s"))
      .filter(length(col("__s")) >= 3)
    val grams = s
      .select(col("doc_id"), col("lang"), col("__s"),
        explode(sequence(lit(1), length(col("__s")) - 2)).as("__i"))
      .select(col("doc_id"), col("lang"),
        col("__s").substr(col("__i"), lit(3)).as("gram"))
      .select(col("doc_id"), col("lang"), col("gram"), xxhash64(col("gram")).as("gram_h"))
      // eager localCheckpoint (not persist): shared by two aggregates
      // below without recompute, blocks GC-reclaimed instead of leaked
      .localCheckpoint(true)
    val counts = grams.groupBy("lang", "gram", "gram_h").count()
    val w = Window.partitionBy(col("lang")).orderBy(col("count").desc, col("gram").asc)
    val profile = counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topM)
      .select(col("lang").as("p_lang"), col("gram_h"), (lit(1.0) / col("rank")).as("weight"))
    val gramCounts = grams.groupBy("doc_id", "gram_h").agg(count(lit(1)).as("cnt"))
    gramCounts.join(broadcast(profile), "gram_h")
      .groupBy("doc_id", "p_lang")
      .agg(sum(col("weight") * col("cnt")).as("score"))
      .groupBy("doc_id")
      .agg(max_by(col("p_lang"), struct(col("score"), col("p_lang"))).as("pred_lang"))
  }

  /** The ORACLE-GATEABLE formulation of [[selfLabelPredictRelational]]
    * (round 9): identical Cavnar-Trenkle semantics, but the inverse-rank
    * weights are QUANTIZED TO INTEGER micro-units
    * (`wq = ⌊10⁶/rank + 0.5⌋`) so the per-(doc, lang) score
    * `Σ wq·cnt` is exact long arithmetic — associative and commutative,
    * bit-identical under ANY partition count, merge order, or engine.
    * A raw `Σ (1/rank)·cnt` double sum accumulates in engine-specific
    * order, and a score pair landing within an ulp of equal would flip
    * the argmax between engines; the ≤5·10⁻⁷ weight quantization is far
    * below anything a trigram profile can distinguish. Argmax tie-break
    * = max (score, lang) lexicographically, mirrored exactly in SQL.
    *
    * Plan shape (round 15): both sides aggregate PER-DOC DISTINCT
    * trigram counts computed row-local by the codegen kernel
    * ([[graft.plans.LangIdExpressions.trigramCounts]] — identical
    * codepoint-sliding trigrams of lower(text), exact occurrence
    * counts), the same move [[selfLabelPredict]] already made. The old
    * form exploded every trigram OCCURRENCE into an eagerly
    * checkpointed frame and paid a (doc_id, gram) exchange over all of
    * it; now the per-doc counts ARE the scoring input (zero exchange on
    * the scoring side) and the profile aggregate's exchange carries
    * distinct-per-doc rows only. Scores are unchanged exact longs:
    * Σ wq·cnt over per-doc counts ≡ Σ wq per occurrence. */
  def selfLabelPredictExact(docs: DataFrame, text: Column, id: Column, lang: Column,
      topM: Int = 200): DataFrame = {
    import graft.plans.LangIdExpressions
    val counts = docs
      .select(lang.as("lang"), LangIdExpressions.trigramCounts(text).as("tc"))
      .select(col("lang"), explode(col("tc")).as("g"))
      .groupBy(col("lang"), col("g.gram").as("gram"))
      .agg(sum(col("g.cnt")).as("count"))
    val w = Window.partitionBy(col("lang")).orderBy(col("count").desc, col("gram").asc)
    val profile = counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topM)
      .select(col("lang").as("p_lang"), col("gram"),
        floor(lit(1000000.0) / col("rank") + lit(0.5)).cast("long").as("wq"))
    val gramCounts = docs
      .select(id.as("doc_id"), LangIdExpressions.trigramCounts(text).as("tc"))
      .select(col("doc_id"), explode(col("tc")).as("g"))
      .select(col("doc_id"), col("g.gram").as("gram"), col("g.cnt").as("cnt"))
    gramCounts.join(broadcast(profile), "gram")
      .groupBy("doc_id", "p_lang")
      .agg(sum(col("wq") * col("cnt")).as("score"))
      .groupBy("doc_id")
      .agg(max_by(col("p_lang"), struct(col("score"), col("p_lang"))).as("pred_lang"))
  }

  /** Classify against an externally-trained profile (the train-once /
    * classify-many flow: persist `train()`'s output, then score any
    * corpus) with the broadcast-literal scoring expression — the profile
    * rows are collected once and classification is a zero-shuffle
    * projection, like [[selfLabelPredict]]'s scoring stage. Matches
    * [[predict]] row-for-row (MultimodalLangIdSpec). */
  def predictCompiled(docs: DataFrame, text: Column, id: Column, profile: DataFrame): DataFrame = {
    import graft.plans.LangIdExpressions
    val rows = profile.select("p_lang", "gram", "weight").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val compiled = LangIdExpressions.buildProfile(rows)
    docs.select(id.as("doc_id"), LangIdExpressions.langScore(text, compiled).as("pred_lang"))
      .filter(col("pred_lang").isNotNull)
  }

  /** Predict the best-scoring language per doc; docs with no profile
    * overlap get null. Doc trigram counts are pre-aggregated (on the
    * 8-byte gram hash) before the broadcast profile join, so the join
    * input is |distinct grams per doc| narrow rows instead of one row per
    * occurrence (score = Σ weight·count is identical). */
  def predict(docs: DataFrame, text: Column, id: Column, profile: DataFrame): DataFrame = {
    val gramCounts = TextOps.charNgramRows(docs, text, id, 3)
      .select(col("doc_id"), xxhash64(col("gram")).as("gram_h"))
      .groupBy("doc_id", "gram_h").agg(count(lit(1)).as("cnt"))
    gramCounts.join(broadcast(profile.select("gram_h", "p_lang", "weight")), "gram_h")
      .groupBy("doc_id", "p_lang")
      .agg(sum(col("weight") * col("cnt")).as("score"))
      .groupBy("doc_id")
      .agg(max_by(col("p_lang"), struct(col("score"), col("p_lang"))).as("pred_lang"))
  }
}

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

  /** Per-language trigram profile with inverse-rank weights. */
  def train(docs: DataFrame, text: Column, lang: Column, topM: Int = 200): DataFrame = {
    val grams = docs.select(lang.as("lang"), explode(TextOps.charNgrams(text, 3)).as("gram"))
    val counts = grams.groupBy("lang", "gram").count()
    val w = Window.partitionBy(col("lang")).orderBy(col("count").desc, col("gram").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topM)
      .select(col("lang").as("p_lang"), col("gram"),
        (lit(1.0) / col("rank")).as("weight"))
  }

  /** Predict the best-scoring language per doc; docs with no profile
    * overlap get null. */
  def predict(docs: DataFrame, text: Column, id: Column, profile: DataFrame): DataFrame = {
    val grams = docs.select(id.as("doc_id"), explode(TextOps.charNgrams(text, 3)).as("gram"))
    grams.join(broadcast(profile), "gram")
      .groupBy("doc_id", "p_lang")
      .agg(sum("weight").as("score"))
      .groupBy("doc_id")
      .agg(max_by(col("p_lang"), struct(col("score"), col("p_lang"))).as("pred_lang"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.functions.Num.r4

/** Relevance search over a document corpus — BM25 (Robertson/Spärck
  * Jones; the Okapi form with the +1 idf floor used by Lucene), the
  * data-selection primitive a pretraining pipeline uses to pull
  * topic-relevant slices out of a web corpus ("find the 1M documents
  * most about X").
  *
  * Scale design (the inverted-index discipline, not a scan-per-query):
  *  - The query-term set is a tiny broadcast LITERAL — the per-document
  *    pass keeps only postings for query terms, so the one shuffle
  *    (`groupBy(doc_id, term)`) carries rows proportional to the number
  *    of query-term OCCURRENCES, never the corpus token count.
  *  - Corpus stats (N, avgdl) and per-term document frequencies are
  *    O(1) / O(|query|) frames, broadcast back onto the postings.
  *  - Final scoring aggregates ≤|query| rows per matching document and
  *    takes top-k via `TakeOrderedAndProject` (per-partition heaps —
  *    no global sort of the scored set).
  *  - Pass count, honestly: scoring inputs (stats, df) must exist
  *    before scoring, so with no precomputed metadata the corpus is
  *    read by THREE column-pruned subtrees (stats / postings / df —
  *    Catalyst has no cross-subtree CSE); a SQL engine's CTE form pays
  *    the same. `corpusStats` removes the stats subtree; df stays a
  *    recompute rather than a `count OVER (PARTITION BY term)` window
  *    because the window would pool a common term's whole posting list
  *    in one partition — the one skew hazard this shape must avoid.
  *
  * Cross-engine determinism: scores are rounded (`Num.r4`) BEFORE the
  * top-k order, and ties break on doc id, so Spark and the SQL oracle
  * agree on the cut row-for-row.
  */
object Search {

  /** Score `docs` against `queryTerms` with BM25; return the top `topK`
    * as (doc_id, n_terms, score), score rounded to 4 decimals,
    * descending with id tiebreak. `k1`/`b` are the standard free
    * parameters (term-frequency saturation / length normalization).
    *
    * `corpusStats` = Some((nDocs, avgdl)) skips the corpus-stats
    * aggregate subtree — without it the plan scans the (2-column-pruned)
    * corpus twice, once for stats and once for postings. A production
    * deployment knows N and avgdl as dataset metadata (they change only
    * on ingest), so repeated queries against the same corpus should pass
    * them and pay exactly ONE scan. */
  def bm25(docs: DataFrame, text: Column, id: Column, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20,
      corpusStats: Option[(Long, Double)] = None): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs.select(id.as("doc_id"), TextOps.tokens(text).as("ts"))

    // one tiny row: corpus size + average doc length (exact long sum /
    // count, divided once — both engines do the same IEEE division)
    val stats = corpusStats match {
      case Some((nDocs, avgdl)) =>
        docs.sparkSession.range(1)
          .select(lit(nDocs).as("n_docs"), lit(avgdl).as("avgdl"))
      case None => toks.agg(
        count(lit(1)).as("n_docs"),
        (sum(size(col("ts"))).cast("double") / count(lit(1))).as("avgdl"))
    }

    // postings for QUERY TERMS ONLY: the isin filter runs before the
    // shuffle, so corpus-scale token mass never moves
    val post = toks
      .select(col("doc_id"), size(col("ts")).as("dl"), explode(col("ts")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))

    // document frequency per query term: ≤|query| rows → broadcast
    val dfreq = post.groupBy("term").agg(count(lit(1)).as("df"))

    val termScore =
      log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))

    post
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(sum(termScore).as("raw"), count(lit(1)).cast("int").as("n_terms"))
      .select(col("doc_id"), col("n_terms"), r4(col("raw")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Query-term postings — (doc_id, dl, term, tf), one row per (doc,
    * matching term), for terms in the `terms` frame only: the semi-join
    * against the broadcast term set runs BEFORE the one (doc, dl, term)
    * shuffle, so corpus-scale token mass never moves. Shared by
    * [[bm25Batch]] and any consumer needing the same frame in the same
    * plan (eval_retrieval_mrr's relevance pick): an IDENTICALLY built
    * subtree canonicalizes equal, so ReuseExchange evaluates the corpus
    * explode once per plan however many consumers hang off it. */
  def queryPostings(docs: DataFrame, text: Column, id: Column,
      terms: DataFrame): DataFrame =
    docs.select(id.as("doc_id"), TextOps.tokens(text).as("ts"))
      .select(col("doc_id"), size(col("ts")).as("dl"), explode(col("ts")).as("term"))
      .join(broadcast(terms), Seq("term"), "left_semi")
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))

  /** Batch BM25 — the production retrieval workload: `queries` is a
    * TABLE of (query_id, term), not a literal list, and every query's
    * top-`topK` comes out of ONE pass over the corpus. Postings are
    * semi-joined against the broadcast term set (union of all queries'
    * terms), scored once per (doc, term), then fanned out to queries by
    * a broadcast term→query join; per-query top-k runs as a
    * WindowGroupLimit (per-partition heaps before the query_id
    * shuffle). Scoring work is shared across queries that share terms —
    * the property that makes thousand-query batches affordable where
    * thousand single-query scans are not. */
  def bm25Batch(docs: DataFrame, text: Column, id: Column, queries: DataFrame,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20,
      corpusStats: Option[(Long, Double)] = None): DataFrame = {
    val toks = docs.select(id.as("doc_id"), TextOps.tokens(text).as("ts"))
    val stats = corpusStats match {
      case Some((nDocs, avgdl)) =>
        docs.sparkSession.range(1)
          .select(lit(nDocs).as("n_docs"), lit(avgdl).as("avgdl"))
      case None => toks.agg(
        count(lit(1)).as("n_docs"),
        (sum(size(col("ts"))).cast("double") / count(lit(1))).as("avgdl"))
    }
    val post = queryPostings(docs, text, id, queries.select(col("term")).distinct())
    val dfreq = post.groupBy("term").agg(count(lit(1)).as("df"))
    val termScore =
      log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    post
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      // distinct: a duplicated (query_id, term) row must not double that
      // term's contribution — the single-query form's isin dedups, and
      // the two APIs must agree on the same logical query
      .join(broadcast(queries.select(col("query_id"), col("term")).distinct()), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(termScore).as("raw"), count(lit(1)).cast("int").as("n_terms"))
      .select(col("query_id"), col("doc_id"), col("n_terms"), r4(col("raw")).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .drop("rn")
      .orderBy(col("query_id"), col("score").desc, col("doc_id"))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Num.r4

import graft.functions.{TextOps, VectorOps}
import graft.operators.{Bpe, Dedup, LangId, Packing, Sampling, Search, Similarity}

/** LLM-data-pipeline extension queries (SURVEY.md §2.11 + driver north
  * star): dedup family, similarity search, text analysis, multimodal
  * columns. Oracle-gated where DuckDB can express the same computation;
  * hash-family ops (MinHash/SimHash/SRP/fingerprints) are registered
  * rows-only and property-tested in the suite instead.
  */
object QueriesLLM {

  private type Q = (SparkSession, String) => DataFrame

  // ---- dedup --------------------------------------------------------------

  val dedupExact: Q = (s, dir) =>
    Dedup.exact(Tables.documents(s, dir), col("text"), col("doc_id"))
      .orderBy("text_hash")

  val dedupExactSql =
    """SELECT md5(lower(trim(text))) AS text_hash, min(doc_id) AS keep_id,
      |  count(*) AS n_dups
      |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin

  /** dedup_incremental: the production ingestion shape — dedup today's
    * batch against yesterday's persisted digest state instead of
    * re-deduping the whole corpus ([[Dedup.incrementalExact]]). The
    * fixture split is SF-independent: docs with doc_id % 5 < 2 are the
    * already-ingested state, the rest arrive as the new batch; only
    * first-seen content survives the anti-join. */
  val dedupIncremental: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val state = Dedup.exact(docs.filter(col("doc_id") % 5 < 2),
      col("text"), col("doc_id")).select("text_hash")
    Dedup.incrementalExact(docs.filter(col("doc_id") % 5 >= 2), state,
      col("text"), col("doc_id"))
      .orderBy("text_hash")
  }

  /** dedup_incremental_minhash: the NEAR-dup half of the ingestion
    * shape ([[Dedup.incrementalMinhash]]): today's batch against the
    * persisted minhash-SIGNATURE state (corpus text never re-read,
    * never shuffled — fixed-width signatures only). Same SF-independent
    * split as dedup_incremental, plus planted re-sends: the batch
    * carries the state's 10 lowest docs again (id + 10⁶) — identical
    * text ⇒ identical signature ⇒ est 1.0, caught with certainty.
    * Rows-only (signature hash family; exact sibling
    * `dedup_incremental` is the oracle-gated one); batch-vs-state
    * semantics, planted-re-send certainty, and the state-bucket cap
    * are asserted in DedupSimilaritySpec. */
  val dedupIncrementalMinhash: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val stateDocs = docs.filter(col("doc_id") % 5 < 2)
    // state as it would be PERSISTED: (doc_id, sig), written at ingest
    val stateSigs = Dedup.minhashSignatures(stateDocs, col("text"), col("doc_id"))
    val resend = stateDocs.orderBy("doc_id").limit(10)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 5 >= 2)
      .select(col("doc_id"), col("text")).unionAll(resend)
    Dedup.incrementalMinhash(batch, stateSigs, col("text"), col("doc_id"),
      threshold = 0.8)
      .orderBy("doc_id")
  }

  /** dedup_incremental_minhash_exact: ORACLE-GATED sibling of the
    * incremental near-dup pipeline — the [[dedupMinhashExact]] argument
    * applied to the batch×state shape. At threshold 1.0 a batch doc is
    * a dup iff its FULL 64-perm signature equals a state doc's, and
    * full-signature equality guarantees collision in EVERY band, so
    * candidate recall on that set is 1 BY CONSTRUCTION — no probability
    * argument. The corpus is fully SYNTHETIC (keyed off `doc_id` only):
    * every 3-token shingle of a state doc contains its own id token, so
    * cross-doc shingle sets are DISJOINT and distinct docs cannot share
    * a signature. The natural fixture cannot play this role — its
    * near-dup families sit at J ≈ 0.98 where P(all 64 minhashes agree)
    * = J⁶⁴ ≈ 0.27, and a batch twin then legitimately matches a
    * different family member by signature while the digest oracle names
    * the text-equal one (observed live: twin of doc 369 matched doc 16).
    * Appended-suffix "novel" perturbations fail the same way (~15% keep
    * an identical signature because no new shingle beats any
    * permutation's min). Batch = identical-text twins of doc_id%3==0
    * (dups; matched_id = that state doc) + disjoint-pattern novels for
    * doc_id%3==1. DuckDB recomputes the whole contract from digest
    * equality. */
  val dedupIncrementalMinhashExact: Q = (s, dir) => {
    val ids = Tables.documents(s, dir).select("doc_id")
    def synth(prefix: String): org.apache.spark.sql.Column =
      concat(lit(prefix + " "), col("doc_id").cast("string"),
        lit(" alpha "), col("doc_id").cast("string"),
        lit(" beta "), col("doc_id").cast("string"),
        lit(" gamma "), col("doc_id").cast("string"))
    val state = ids.select(col("doc_id"), synth("doc").as("text"))
    val batch = state.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
      .unionAll(ids.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + lit(2000000L)).as("doc_id"),
          synth("novel").as("text")))
    val stateSigs = Dedup.minhashSignatures(state, col("text"), col("doc_id"))
    Dedup.incrementalMinhash(batch, stateSigs, col("text"), col("doc_id"),
      threshold = 1.0)
      .orderBy("doc_id")
  }

  val dedupIncrementalMinhashExactSql =
    """WITH ids AS (SELECT doc_id FROM documents),
      |state AS (SELECT doc_id,
      |    md5('doc ' || doc_id || ' alpha ' || doc_id || ' beta ' || doc_id || ' gamma ' || doc_id) AS d
      |  FROM ids),
      |batch AS (
      |  SELECT doc_id + 1000000 AS doc_id, d
      |  FROM state WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000 AS doc_id,
      |    md5('novel ' || doc_id || ' alpha ' || doc_id || ' beta ' || doc_id || ' gamma ' || doc_id) AS d
      |  FROM ids WHERE doc_id % 3 = 1),
      |m AS (SELECT b.doc_id, min(s.doc_id) AS matched_id
      |  FROM batch b JOIN state s ON b.d = s.d GROUP BY b.doc_id)
      |SELECT b.doc_id, m.matched_id IS NOT NULL AS is_dup, m.matched_id,
      |  CASE WHEN m.matched_id IS NOT NULL THEN CAST(1.0 AS DOUBLE) ELSE NULL END AS est_jaccard
      |FROM batch b LEFT JOIN m USING (doc_id)
      |ORDER BY b.doc_id""".stripMargin

  val dedupIncrementalSql =
    """WITH state AS (
      |  SELECT DISTINCT md5(lower(trim(text))) AS text_hash
      |  FROM documents WHERE doc_id % 5 < 2),
      |batch AS (
      |  SELECT md5(lower(trim(text))) AS text_hash, min(doc_id) AS keep_id,
      |    count(*) AS n_batch_dups
      |  FROM documents WHERE doc_id % 5 >= 2 GROUP BY 1)
      |SELECT b.text_hash, b.keep_id, b.n_batch_dups FROM batch b
      |WHERE NOT EXISTS (SELECT 1 FROM state s WHERE s.text_hash = b.text_hash)
      |ORDER BY b.text_hash""".stripMargin

  /** dedup_jaccard: exact shingle-set Jaccard >= 0.5 via inverted-index
    * join (no O(n²) pair enumeration). */
  val dedupJaccard: Q = (s, dir) =>
    Dedup.jaccardPairs(Tables.documents(s, dir), col("text"), col("doc_id"), 0.5)
      .orderBy("a_id", "b_id")

  val dedupJaccardSql =
    """WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, greatest(len(t) - 2, 0) + 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
      |  FROM tk),
      |i AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS ni
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
      |SELECT * FROM (
      |  SELECT a_id, b_id, floor((ni * 1.0 / (sa.n + sb.n - ni)) * 10000 + 0.5) / 10000 AS jaccard
      |  FROM i JOIN sz sa ON i.a_id = sa.doc_id JOIN sz sb ON i.b_id = sb.doc_id) sub
      |WHERE jaccard >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  /** dedup_editdist: character-level near-dup pairs by bounded edit
    * distance ([[Dedup.editDistancePairs]]) — typo/OCR/small-patch
    * variants whose token sets diverge (Jaccard-blind) but whose char
    * streams differ by ≤ 20 edits. Blocking (16-char prefix + length
    * window + hot-block cap) is the declared contract; verification is
    * the THRESHOLDED banded Levenshtein. The distance filter is
    * non-vacuous at every SF (≥1 blocked pair exceeds it). */
  val dedupEditdist: Q = (s, dir) =>
    Dedup.editDistancePairs(Tables.documents(s, dir), col("text"), col("doc_id"))
      .orderBy("a", "b")

  val dedupEditdistSql =
    """WITH d AS (
      |  SELECT doc_id, text, length(text) AS len, substr(text, 1, 16) AS pfx
      |  FROM documents),
      |small AS (SELECT pfx FROM d GROUP BY pfx HAVING count(*) <= 1000),
      |b AS (SELECT d.* FROM d JOIN small USING (pfx))
      |SELECT x.doc_id AS a, y.doc_id AS b, levenshtein(x.text, y.text) AS dist
      |FROM b x JOIN b y ON x.pfx = y.pfx AND x.doc_id < y.doc_id
      |  AND abs(x.len - y.len) <= 10
      |WHERE levenshtein(x.text, y.text) <= 20
      |ORDER BY a, b""".stripMargin

  /** dedup_containment: exact directed shingle-containment pairs
    * ([[Dedup.containmentPairs]], C(src→dst) = |∩|/|S(src)| ≥ 0.8) — the
    * quote/excerpt detector document-level Jaccard misses (a short doc
    * fully inside a long one has C≈1 but tiny J). Same inverted-index
    * shape as `dedup_jaccard`; both directions derive from ONE
    * undirected intersection count. */
  val dedupContainment: Q = (s, dir) =>
    Dedup.containmentPairs(Tables.documents(s, dir), col("text"), col("doc_id"), 0.8)
      .orderBy("src_id", "dst_id")

  val dedupContainmentSql =
    """WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, greatest(len(t) - 2, 0) + 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
      |  FROM tk),
      |i AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS ni
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |dir AS (
      |  SELECT i.a_id AS src_id, i.b_id AS dst_id,
      |    floor((i.ni * 1.0 / sa.n) * 10000 + 0.5) / 10000 AS containment
      |  FROM i JOIN sz sa ON i.a_id = sa.doc_id
      |  UNION ALL
      |  SELECT i.b_id, i.a_id,
      |    floor((i.ni * 1.0 / sb.n) * 10000 + 0.5) / 10000
      |  FROM i JOIN sz sb ON i.b_id = sb.doc_id)
      |SELECT src_id, dst_id, containment FROM dir
      |WHERE containment >= 0.8
      |ORDER BY src_id, dst_id""".stripMargin

  /** dedup_url: web-corpus URL dedup — canonicalize
    * (lowercase host, drop default port, strip utm params + trailing
    * slash), then group. The fixture has no URL column, so four noisy
    * variants of each customer's URL are built deterministically from
    * orders (case/port/tracking/slash noise keyed by orderkey%4); the
    * canonical groups collapse them. Zero-shuffle projection + one
    * count aggregate — the canonical 100 TB dedup shape. */
  val dedupUrl: Q = (s, dir) => {
    val noisy = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
      (col("o_orderkey") % 4).as("v"))
      .select(col("o_custkey"),
        when(col("v") === 0, concat(lit("https://data.example.org/c/"), col("o_custkey")))
          .when(col("v") === 1, concat(lit("HTTPS://DATA.EXAMPLE.ORG/c/"), col("o_custkey")))
          .when(col("v") === 2, concat(lit("https://data.example.org:443/c/"), col("o_custkey")))
          .otherwise(concat(lit("https://data.example.org/c/"), col("o_custkey"),
            lit("/?utm_source=feed"))).as("url"))
    noisy.select(col("o_custkey"), TextOps.canonicalizeUrl(col("url")).as("canon_url"))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_dups"), min("o_custkey").as("keep_key"))
      .orderBy("canon_url")
  }

  val dedupUrlSql =
    """WITH noisy AS (
      |  SELECT o_custkey,
      |    CASE o_orderkey % 4
      |      WHEN 0 THEN 'https://data.example.org/c/' || o_custkey
      |      WHEN 1 THEN 'HTTPS://DATA.EXAMPLE.ORG/c/' || o_custkey
      |      WHEN 2 THEN 'https://data.example.org:443/c/' || o_custkey
      |      ELSE 'https://data.example.org/c/' || o_custkey || '/?utm_source=feed'
      |    END AS url
      |  FROM orders),
      |canon0 AS (
      |  SELECT o_custkey, regexp_replace(
      |    lower(regexp_extract(url, '^([^/]+://[^/]+)', 1)) || regexp_replace(url, '^[^/]+://[^/]+', ''),
      |    ':443/', '/', 'g') AS p
      |  FROM noisy),
      |canon1 AS (
      |  SELECT o_custkey, strpos(p, '?') AS qpos,
      |    CASE WHEN strpos(p, '?') > 0 THEN substr(p, 1, strpos(p, '?') - 1) ELSE p END AS path,
      |    regexp_replace(regexp_replace(
      |      '&' || CASE WHEN strpos(p, '?') > 0 THEN substr(p, strpos(p, '?') + 1) ELSE '' END,
      |      '&utm_[a-z]+=[^&]*', '', 'g'), '^&', '') AS q
      |  FROM canon0),
      |canon AS (
      |  SELECT o_custkey, regexp_replace(
      |    CASE WHEN qpos > 0 AND length(q) > 0 THEN path || '?' || q ELSE path END,
      |    '/$', '') AS canon_url
      |  FROM canon1)
      |SELECT canon_url, count(*) AS n_dups, min(o_custkey) AS keep_key
      |FROM canon GROUP BY canon_url ORDER BY canon_url""".stripMargin

  /** dedup_url_params: URL dedup under query-PARAM-ORDER noise (round 9)
    * — three deterministic variants per order serve the same resource as
    * `?a=N&b=2`, `?b=2&a=N`, and `?a=N&utm_source=feed&b=2`;
    * [[TextOps.canonicalizeUrlSorted]] collapses all three (utm
    * stripped, params byte-order sorted). Zero-shuffle projection + one
    * count aggregate, like [[dedupUrl]]. */
  val dedupUrlParams: Q = (s, dir) => {
    val noisy = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
      (col("o_orderkey") % 3).as("v"))
      .select(col("o_custkey"),
        when(col("v") === 0, concat(lit("https://data.example.org/c/"), col("o_custkey"),
            lit("?a="), col("o_custkey"), lit("&b=2")))
          .when(col("v") === 1, concat(lit("https://data.example.org/c/"), col("o_custkey"),
            lit("?b=2&a="), col("o_custkey")))
          .otherwise(concat(lit("https://data.example.org/c/"), col("o_custkey"),
            lit("?a="), col("o_custkey"), lit("&utm_source=feed&b=2"))).as("url"))
    // staged: canonical chain in its own projection, param sort over the
    // attribute — see TextOps.sortUrlParams on why composing them inline
    // costs 4× the regex chain per row (12× measured at sf0.1)
    noisy.select(col("o_custkey"), TextOps.canonicalizeUrl(col("url")).as("__c"))
      .select(col("o_custkey"), TextOps.sortUrlParams(col("__c")).as("canon_url"))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_dups"), min("o_custkey").as("keep_key"))
      .orderBy("canon_url")
  }

  val dedupUrlParamsSql =
    """WITH noisy AS (
      |  SELECT o_custkey,
      |    CASE o_orderkey % 3
      |      WHEN 0 THEN 'https://data.example.org/c/' || o_custkey || '?a=' || o_custkey || '&b=2'
      |      WHEN 1 THEN 'https://data.example.org/c/' || o_custkey || '?b=2&a=' || o_custkey
      |      ELSE 'https://data.example.org/c/' || o_custkey || '?a=' || o_custkey || '&utm_source=feed&b=2'
      |    END AS url
      |  FROM orders),
      |canon0 AS (
      |  SELECT o_custkey, regexp_replace(
      |    lower(regexp_extract(url, '^([^/]+://[^/]+)', 1)) || regexp_replace(url, '^[^/]+://[^/]+', ''),
      |    ':443/', '/', 'g') AS p
      |  FROM noisy),
      |canon1 AS (
      |  SELECT o_custkey, strpos(p, '?') AS qpos,
      |    CASE WHEN strpos(p, '?') > 0 THEN substr(p, 1, strpos(p, '?') - 1) ELSE p END AS path,
      |    regexp_replace(regexp_replace(
      |      '&' || CASE WHEN strpos(p, '?') > 0 THEN substr(p, strpos(p, '?') + 1) ELSE '' END,
      |      '&utm_[a-z]+=[^&]*', '', 'g'), '^&', '') AS q
      |  FROM canon0),
      |canon AS (
      |  SELECT o_custkey, regexp_replace(
      |    CASE WHEN qpos > 0 AND length(q) > 0 THEN path || '?' || q ELSE path END,
      |    '/$', '') AS c
      |  FROM canon1),
      |sorted AS (
      |  SELECT o_custkey,
      |    CASE WHEN strpos(c, '?') > 0
      |      THEN substr(c, 1, strpos(c, '?') - 1) || '?' ||
      |        array_to_string(list_sort(string_split(substr(c, strpos(c, '?') + 1), '&')), '&')
      |      ELSE c END AS canon_url
      |  FROM canon)
      |SELECT canon_url, count(*) AS n_dups, min(o_custkey) AS keep_key
      |FROM sorted GROUP BY canon_url ORDER BY canon_url""".stripMargin

  /** contamination_check: benchmark decontamination — flag corpus docs
    * sharing any verbatim 5-gram with a (stand-in) eval set, with the
    * count of distinct shared grams. The benchmark's gram set broadcasts
    * (eval sets are tiny); the corpus side is a narrow explode into a
    * broadcast join — the corpus is NEVER shuffled; only matched rows
    * reach the per-doc aggregate. */
  val contaminationCheck: Q = (s, dir) => {
    import graft.operators.Contamination
    val docs = Tables.documents(s, dir)
    Contamination.flagged(
        corpus = docs.filter(col("doc_id") % 97 =!= 0),
        benchmark = docs.filter(col("doc_id") % 97 === 0),
        col("text"), col("doc_id"), n = 5)
      .orderBy("doc_id")
  }

  val contaminationCheckSql =
    """WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |g AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 4, 0) + 1),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS sh
      |  FROM tk),
      |bench AS (SELECT DISTINCT sh FROM g WHERE doc_id % 97 = 0)
      |SELECT doc_id, count(DISTINCT g.sh) AS n_hits
      |FROM g JOIN bench USING (sh)
      |WHERE doc_id % 97 <> 0
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** dedup_minhash: LSH candidates + signature-estimated Jaccard.
    * Hash family is salted xxhash64 — not expressible in DuckDB, so this
    * is rows-only; MinhashSpec property-tests the estimate against exact
    * Jaccard. */
  val dedupMinhash: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    // signatures are the expensive stage: compute once (eager
    // localCheckpoint — GC-reclaimed, unlike a session-lifetime persist),
    // share between candidate generation and verification
    val sigs = Dedup.minhashSignatures(docs, col("text"), col("doc_id")).localCheckpoint(true)
    val cands = Dedup.candidatesFromSignatures(sigs)
    Dedup.verifyFromSignatures(cands, sigs)
      .filter(col("est_jaccard") >= 0.4)
      .orderBy("a_id", "b_id")
  }

  /** dedup_minhash_exact: ORACLE-GATED exact-verify stage of the minhash
    * pipeline (round-8 verdict ask #5) — banded LSH candidates filtered
    * by an EXACT digest verify. An identical-text pair has an identical
    * signature, hence collides in EVERY band, so candidate recall on
    * the digest-equal family is 1 BY CONSTRUCTION — no probability
    * argument (the 10⁴ hot-bucket cap sits far above any fixture
    * family) — and the verified output is exactly the identical-text
    * pair set, which DuckDB recomputes with a digest self-join. The
    * fixture has no digest-equal pairs below sf0.1, so an identical-text
    * twin (doc_id + 10⁶) is planted per doc, the [[simPairsLsh]] trick:
    * every doc then carries ≥1 true pair and the gate is non-vacuous at
    * every SF. Gates the candidate plumbing — kernel signatures,
    * banding, bucket self-join, hot-bucket guard pass-through —
    * end-to-end; the estimate arithmetic stays property-tested
    * (rows-only) in `dedup_minhash` itself. */
  val dedupMinhashExact: Q = (s, dir) => {
    val docs0 = Tables.documents(s, dir).select("doc_id", "text")
    val twins = docs0.select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
    val docs = docs0.unionAll(twins)
    val sigs = Dedup.minhashSignatures(docs, col("text"), col("doc_id")).localCheckpoint(true)
    val cands = Dedup.candidatesFromSignatures(sigs)
    val dig = docs.select(col("doc_id"), md5(lower(trim(col("text")))).as("__d"))
    cands
      .join(dig.select(col("doc_id").as("a_id"), col("__d").as("__da")), "a_id")
      .join(dig.select(col("doc_id").as("b_id"), col("__d").as("__db")), "b_id")
      .filter(col("__da") === col("__db"))
      .select("a_id", "b_id")
      .orderBy("a_id", "b_id")
  }

  val dedupMinhashExactSql =
    """WITH u AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |FROM u a JOIN u b
      |  ON a.doc_id < b.doc_id
      | AND md5(lower(trim(a.text))) = md5(lower(trim(b.text)))
      |ORDER BY a_id, b_id""".stripMargin

  /** dedup_simhash: near-dup pairs at Hamming <= 3 over 64-bit SimHash
    * (banded; rows-only — hash family not expressible in DuckDB). */
  val dedupSimhash: Q = (s, dir) =>
    Dedup.simhashPairs(Tables.documents(s, dir), col("text"), col("doc_id"))
      .orderBy("a_id", "b_id")

  /** dedup_simhash_exact: ORACLE-GATED SimHash — the
    * [[dedupMinhashExact]] construction applied to the SimHash family,
    * which until round 9 carried no gated member. Identical text yields
    * an identical 64-bit sketch, so every identical-text pair has
    * Hamming distance 0, collides in all four 16-bit chunks, and is
    * emitted deterministically; restricting the verified output to
    * digest-equal pairs makes it exactly the identical-text pair set,
    * which DuckDB recomputes with a digest self-join. An identical-text
    * twin (doc_id + 10⁶) is planted per doc so the gate is non-vacuous
    * at every SF. Gates the sketch kernel, chunk banding, bucket
    * self-join and Hamming rescore end-to-end; the near-dup (0 <
    * Hamming ≤ 3) behavior stays property-tested in `dedup_simhash`. */
  val dedupSimhashExact: Q = (s, dir) => {
    val docs0 = Tables.documents(s, dir).select("doc_id", "text")
    val twins = docs0.select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
    val docs = docs0.unionAll(twins)
    val pairs = Dedup.simhashPairs(docs, col("text"), col("doc_id"))
    val dig = docs.select(col("doc_id"), md5(lower(trim(col("text")))).as("__d"))
    pairs
      .join(dig.select(col("doc_id").as("a_id"), col("__d").as("__da")), "a_id")
      .join(dig.select(col("doc_id").as("b_id"), col("__d").as("__db")), "b_id")
      .filter(col("__da") === col("__db"))
      .select("a_id", "b_id")
      .orderBy("a_id", "b_id")
  }

  val dedupSimhashExactSql =
    """WITH u AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |FROM u a JOIN u b
      |  ON a.doc_id < b.doc_id
      | AND md5(lower(trim(a.text))) = md5(lower(trim(b.text)))
      |ORDER BY a_id, b_id""".stripMargin

  // ---- similarity search --------------------------------------------------

  val simTopkCosine: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.topKCosine(emb, emb.filter(col("vec_id") === 0), 11)
  }

  val simTopkCosineSql =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, floor((
      |  list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
      |  / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS cosine
      |FROM embeddings CROSS JOIN q
      |ORDER BY cosine DESC, vec_id LIMIT 11""".stripMargin

  /** sim_mmr_rerank: MMR diversification of vec_id 0's top-12 cosine
    * candidates — pick 5 with λ=0.7 ([[Similarity.mmrRerank]]; Carbonell
    * & Goldstein 1998). All sims are 1e4 micro-unit integers (the gated
    * cosine chain's r4 floor, undivided), λ an integer-tenths weight, so
    * every selection compares pure BIGINTs; the oracle replays the
    * greedy loop as 5 unrolled CTE steps over the SAME integer sims. */
  val simMmrRerank: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.mmrRerank(emb, emb.filter(col("vec_id") === 0),
        k = 5, pool = 12, lambdaTenths = 7)
      .orderBy("mmr_rank")
  }

  val simMmrRerankSql: String = {
    // the same integer micro-unit cosine both engines' gated sim queries
    // share, kept undivided (a/b are row aliases carrying `embedding`)
    def cosU(a: String, b: String) =
      s"""CAST(floor((
         |    list_sum(list_transform(range(1, 65), i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))
         |    / (sqrt(list_sum(list_transform($a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |       * sqrt(list_sum(list_transform($b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 10000 + 0.5) AS BIGINT)"""
        .stripMargin
    val steps = (2 to 5).map { i =>
      s"""st$i AS (SELECT c.vec_id, c.qs_u,
         |    7 * c.qs_u - 3 * (SELECT max(p.s_u) FROM pw p
         |      WHERE p.a_id = c.vec_id AND p.b_id IN (SELECT vec_id FROM acc${i - 1})) AS sc
         |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM acc${i - 1})),
         |sel$i AS (SELECT vec_id, qs_u, $i AS mmr_rank FROM st$i ORDER BY sc DESC, vec_id LIMIT 1),
         |acc$i AS (SELECT vec_id FROM acc${i - 1} UNION ALL SELECT vec_id FROM sel$i)"""
        .stripMargin
    }.mkString(",\n")
    val unions = (2 to 5).map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")
    s"""WITH qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
       |scored AS (SELECT e.vec_id, ${cosU("e", "q")} AS qs_u
       |  FROM embeddings e CROSS JOIN qv q),
       |cand AS (SELECT vec_id, qs_u FROM scored ORDER BY qs_u DESC, vec_id LIMIT 12),
       |ce AS (SELECT c.vec_id, e.embedding FROM cand c JOIN embeddings e USING (vec_id)),
       |pw AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, ${cosU("a", "b")} AS s_u
       |  FROM ce a JOIN ce b ON a.vec_id <> b.vec_id),
       |sel1 AS (SELECT vec_id, qs_u, 1 AS mmr_rank FROM cand ORDER BY qs_u DESC, vec_id LIMIT 1),
       |acc1 AS (SELECT vec_id FROM sel1),
       |$steps
       |SELECT CAST(mmr_rank AS INT) AS mmr_rank, vec_id, qs_u AS q_sim_u
       |FROM (SELECT * FROM sel1 UNION ALL $unions)
       |ORDER BY mmr_rank""".stripMargin
  }

  val simPairsThreshold: Q = (s, dir) =>
    Similarity.pairsAboveThreshold(Tables.embeddings(s, dir), 0.35)
      .orderBy("a_id", "b_id")

  val simPairsThresholdSql =
    """SELECT * FROM (
      |SELECT a.vec_id AS a_id, b.vec_id AS b_id, floor((
      |  list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |  / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |) sub WHERE cosine >= 0.35
      |ORDER BY a_id, b_id""".stripMargin

  /** sim_pairs_lsh_loose: the LOOSE-threshold (τ=0.35) DEMONSTRATOR —
    * deliberately NOT the primary name (round-8 verdict ask #1): at this
    * τ the SRP gap (p₁=0.61 vs p₂=0.5) is too small for LSH
    * amplification, so the fixed 16×4 banding admits ~64% of all pairs
    * as candidates and the cost scales like the exact form's n²
    * (measured in the round-8 ×10 probe — 32× per 10× input, SCALE.md).
    * That is a property of the τ REGIME, not the plan; it is kept,
    * suffixed, precisely to document where banded LSH stops working.
    * [[simPairsLsh]] (the primary name) is the production near-dup
    * regime with n^ρ-sized parameters; below τ ≈ 0.3 brute force
    * ([[simPairsThreshold]]) or IVF is the right tool. Rows-only
    * (bucketing hash not expressible in DuckDB); precision 1 / recall
    * vs the brute-force truth asserted in DedupSimilaritySpec. */
  val simPairsLshLoose: Q = (s, dir) =>
    Similarity.pairsLsh(Tables.embeddings(s, dir), 0.35)
      .orderBy("a_id", "b_id")

  /** sim_pairs_lsh: the production near-dup regime (τ=0.8) with
    * parameters auto-sized from the corpus count by the classic n^ρ rule
    * ([[Similarity.autoLshParams]]): band width grows with ⌈log₂ n⌉ so
    * RANDOM collisions stay ~linear in n, band count with n^ρ (ρ≈0.33
    * at τ=0.8) so recall holds — the configuration a 100 TB dedup run
    * would compute, demonstrated live. Multi-word sketches carry
    * bands×bits > 64.
    *
    * The fixture has no pairs above cos ≈ 0.48, so the near-dup corpus
    * is built IN-QUERY: every vector gets a deterministic twin
    * (id + 10⁶, each component + 2⁻⁶ — exact in binary, so Spark's
    * float add and the oracle's CAST(x + 0.015625 AS FLOAT) produce
    * BIT-IDENTICAL values; twin cosine ≈ 0.9999, cross pairs stay
    * < 0.5). ORACLE-GATED — the first LSH row that is: sizing for the
    * τ=0.8 WORST CASE makes the per-twin-pair miss probability
    * (1 − p₁^r)^b ≈ 10⁻⁴³ at the fixture similarity, so LSH output =
    * exact output deterministically, and DuckDB recomputes the exact
    * form over the same planted corpus. Precision-1/recall and the
    * sizing rule are additionally asserted in DedupSimilaritySpec.
    * PRIMARY name since round 9 (was `sim_pairs_lsh_auto`): the default
    * a user reaches for must be the configuration that survives scale;
    * the fixed-band loose-τ form lives on as [[simPairsLshLoose]]. */
  val simPairsLsh: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
    val twins = emb.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.015625f)).as("embedding"))
    val u = emb.unionAll(twins)
    val p = Similarity.autoLshParams(2L * emb.count(), tau = 0.8)
    Similarity.pairsLsh(u, 0.8, p.bands, p.bitsPerBand)
      .orderBy("a_id", "b_id")
  }

  val simPairsLshSql =
    """WITH u AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id,
      |    list_transform(embedding, x -> CAST(x + 0.015625 AS FLOAT)) AS embedding
      |  FROM embeddings)
      |SELECT * FROM (
      |SELECT a.vec_id AS a_id, b.vec_id AS b_id, floor((
      |  list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |  / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS cosine
      |FROM u a JOIN u b ON a.vec_id < b.vec_id
      |) sub WHERE cosine >= 0.8
      |ORDER BY a_id, b_id""".stripMargin

  /** dedup_semantic: embedding near-dup pairs clustered into components
    * (min-label propagation to fixpoint) — each vector labeled with the
    * min id reachable through the τ=0.35 pair graph. Oracle: DuckDB
    * WITH RECURSIVE transitive closure over the identical pair list. */
  val dedupSemantic: Q = (s, dir) => {
    import graft.operators.Components
    val pairs = Similarity.pairsAboveThreshold(Tables.embeddings(s, dir), 0.35)
      .select("a_id", "b_id")
    Components.semanticDedup(pairs).orderBy("vec_id")
  }

  /** dedup_semantic_lsh_loose: the τ=0.35 DEMONSTRATOR of LSH-fed
    * semantic dedup — suffixed, not primary (round-8 verdict ask #1),
    * because its pair generator rides the loose-τ regime where banded
    * SRP degrades toward all-pairs (22× per 10× input at the ×10 probe,
    * SCALE.md). Kept to document the τ floor; [[dedupSemanticLsh]] is
    * the production-regime primary. Rows-only (SRP hash family); cluster
    * agreement vs the exact-pair form asserted in ComponentsSpec. */
  val dedupSemanticLshLoose: Q = (s, dir) => {
    import graft.operators.Components
    val pairs = Similarity.pairsLsh(Tables.embeddings(s, dir), 0.35)
      .select("a_id", "b_id")
    // tiered CC (driver union-find ≤ 2²⁰ edges → one-round contraction →
    // distributed loop): the verified near-dup pair graph is tiny relative
    // to the corpus (3.9k edges at sf0.1), so the bounded fast paths
    // engage; connectedComponentsStars stays the deep-graph alternative
    // (identical output, property-asserted in ComponentsSpec).
    Components.connectedComponents(pairs)
      .select(col("node").as("vec_id"), col("cluster_id"))
      .orderBy("vec_id")
  }

  /** dedup_semantic_lsh: the 100 TB wiring of semantic dedup — banded
    * SRP LSH candidate pairs (no O(n²) stage anywhere in the plan) feed
    * tiered connected components ([[graft.operators.Components]]).
    * PRIMARY name runs the PRODUCTION regime (round-8 verdict ask #1):
    * near-dup threshold τ=0.8 with [[Similarity.autoLshParams]] n^ρ
    * sizing — band width ⌈log₂ n⌉ keeps random collisions linear in n,
    * band count n^ρ holds recall. The fixture has no natural pairs
    * above cos ≈ 0.48, so the near-dup corpus is built IN-QUERY exactly
    * as [[simPairsLsh]]: a deterministic twin per vector (id + 10⁶,
    * components + 2⁻⁶ — exact in binary on both engines). ORACLE-GATED:
    * worst-case-τ sizing puts the per-pair miss probability ≈ 10⁻⁴³,
    * so the LSH pair set ≡ the exact pair set deterministically, and
    * DuckDB recomputes exact pairs + a WITH RECURSIVE transitive
    * closure over them. */
  val dedupSemanticLsh: Q = (s, dir) => {
    import graft.operators.Components
    val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
    val twins = emb.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.015625f)).as("embedding"))
    val u = emb.unionAll(twins)
    val p = Similarity.autoLshParams(2L * emb.count(), tau = 0.8)
    val pairs = Similarity.pairsLsh(u, 0.8, p.bands, p.bitsPerBand)
      .select("a_id", "b_id")
    Components.connectedComponents(pairs)
      .select(col("node").as("vec_id"), col("cluster_id"))
      .orderBy("vec_id")
  }

  val dedupSemanticLshSql =
    """WITH RECURSIVE u AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id,
      |    list_transform(embedding, x -> CAST(x + 0.015625 AS FLOAT)) AS embedding
      |  FROM embeddings),
      |p AS (SELECT * FROM (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, floor((
      |    list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS cosine
      |  FROM u a JOIN u b ON a.vec_id < b.vec_id
      |  ) sub WHERE cosine >= 0.8),
      |e AS (SELECT a_id AS s, b_id AS d FROM p UNION ALL SELECT b_id, a_id FROM p),
      |r(n, m) AS (
      |  SELECT s, s FROM e
      |  UNION
      |  SELECT r.n, e.d FROM r JOIN e ON r.m = e.s
      |)
      |SELECT n AS vec_id, min(m) AS cluster_id FROM r GROUP BY n ORDER BY vec_id""".stripMargin

  val dedupSemanticSql =
    """WITH RECURSIVE p AS (
      |  SELECT * FROM (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, floor((
      |    list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS cosine
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  ) sub WHERE cosine >= 0.35),
      |e AS (SELECT a_id AS s, b_id AS d FROM p UNION ALL SELECT b_id, a_id FROM p),
      |r(n, m) AS (
      |  SELECT s, s FROM e
      |  UNION
      |  SELECT r.n, e.d FROM r JOIN e ON r.m = e.s
      |)
      |SELECT n AS vec_id, min(m) AS cluster_id FROM r GROUP BY n ORDER BY vec_id""".stripMargin

  /** sim_ann_lsh: sign-random-projection bucketed ANN — the 100 TB scale
    * path (no cross join). Rows-only; recall vs brute force is asserted in
    * SimilaritySpec. */
  val simAnnLsh: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.annTopK(emb, emb.filter(col("vec_id") === 0), 11, 4)
  }

  /** sim_ann_multiprobe: SRP ANN probing the query bucket plus all
    * Hamming-1 neighbors — the recall lever over sim_ann_lsh without
    * extra tables. Rows-only; recall dominance asserted in
    * DedupSimilaritySpec. */
  val simAnnMultiprobe: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.annTopKMultiProbe(emb, emb.filter(col("vec_id") === 0), 11, 4)
  }

  /** sim_ann_ivf: IVF coarse-quantized ANN (deterministic centroids,
    * nProbe cells rescored exactly) — the second scale path next to SRP.
    * Rows-only; recall vs brute force asserted in DedupSimilaritySpec. */
  val simAnnIvf: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") === 0), 11)
  }

  /** sim_ann_ivf_kmeans: IVF with Lloyd-refined centroids (deterministic,
    * RNG-free, 3 rounds) — each round is a zero-shuffle assignment plus
    * one bounded (centroid, dim) aggregate. Rows-only; recall vs exact
    * and vs the seed-centroid IVF asserted in DedupSimilaritySpec. */
  val simAnnIvfKmeans: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val centroids = Similarity.ivfCentroidsKmeans(emb, 16, iters = 3)
    Similarity.ivfTopKWith(emb, emb.filter(col("vec_id") === 0), 11, centroids)
  }

  /** Doubled corpus for the ANN twins gates: every vector gets an
    * IDENTICAL twin at id + 10⁶ (same floats, bit for bit). */
  private def annTwinCorpus(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
    emb.unionAll(emb.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      col("embedding")))
  }

  /** sim_ann_lsh_twins: ORACLE-GATED SRP-bucketed ANN — the planted
    * identical-twin construction of [[simKnnGraphBandedTwins]] applied
    * to the ANN QUERY path, whose family (sim_ann_*) carried no gated
    * member until round 9. The query (vector 0) and its twin are
    * bit-identical, so their SRP buckets are equal BY CONSTRUCTION —
    * the twin is always a candidate — and at k = 2 the exact top-2
    * {query itself, its twin}, both cosine 1.0, is entirely in-bucket
    * (this corpus' natural cosines top out ≈ 0.48, and any natural
    * exact-duplicate vector would share the bucket for the same
    * reason). Hence bucketed ANN ≡ brute force deterministically, and
    * DuckDB recomputes the brute-force top-2 over the doubled corpus.
    * Gates the sketch kernel, bucket equi-join, broadcast query side,
    * exact rescore and (cosine, id) tie-break end-to-end; recall at
    * k > 2 stays property-tested in `sim_ann_lsh`. */
  val simAnnLshTwins: Q = (s, dir) => {
    val u = annTwinCorpus(s, dir)
    Similarity.annTopK(u, u.filter(col("vec_id") === 0), 2, 4)
      .orderBy(col("cosine").desc, col("vec_id").asc)
  }

  /** sim_ann_multiprobe_twins: ORACLE-GATED multi-probe ANN — same
    * construction as [[simAnnLshTwins]]; the probe set (query bucket +
    * all Hamming-1 buckets) is a superset of the exact-bucket probe, so
    * the twin-candidate guarantee carries over verbatim. Gates the
    * probe-list explode and the multi-bucket join. */
  val simAnnMultiprobeTwins: Q = (s, dir) => {
    val u = annTwinCorpus(s, dir)
    Similarity.annTopKMultiProbe(u, u.filter(col("vec_id") === 0), 2, 4)
      .orderBy(col("cosine").desc, col("vec_id").asc)
  }

  /** sim_ann_ivf_twins: ORACLE-GATED IVF ANN — the identical twin
    * produces a bit-identical centroid argmax, so query, twin and the
    * query's own corpus row co-locate in one IVF cell by construction,
    * and the query's top-ranked probe cell is that cell (its own
    * centroid similarity ≈ 1.0 vs ≤ 0.48 for every other centroid —
    * no tie is possible). IVF top-2 ≡ brute-force top-2
    * deterministically; DuckDB recomputes it. Gates seed-centroid
    * selection, zero-shuffle assignment, probe-cell ranking and the
    * in-cell rescore. */
  val simAnnIvfTwins: Q = (s, dir) => {
    val u = annTwinCorpus(s, dir)
    Similarity.ivfTopK(u, u.filter(col("vec_id") === 0), 2)
      .orderBy(col("cosine").desc, col("vec_id").asc)
  }

  /** Shared oracle for the three ANN twins gates: brute-force top-2 from
    * query vector 0 over the doubled corpus. */
  val simAnnTwinsSql =
    """WITH u AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings),
      |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, floor((
      |  list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
      |  / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS cosine
      |FROM u CROSS JOIN q
      |ORDER BY cosine DESC, vec_id LIMIT 2""".stripMargin

  /** sim_knn_graph_banded: the banded-SRP kNN-graph DEMONSTRATOR —
    * suffixed, not primary (round-8 verdict ask #1): this corpus'
    * top-k neighbors sit at cos ≈ 0.3–0.5, below LSH's amplification
    * regime, so banded candidates degrade toward all pairs at scale
    * (33× per 10× input at the ×10 probe, SCALE.md). Kept to document
    * the regime boundary; [[simKnnGraph]] (IVF cells) is the primary.
    * Rows-only (SRP family), recall vs the brute-force graph asserted
    * in DedupSimilaritySpec. */
  val simKnnGraphBanded: Q = (s, dir) =>
    Similarity.knnGraph(Tables.embeddings(s, dir), 5)
      .orderBy("src", "rk")

  /** sim_knn_graph: kNN-graph construction via IVF cells — the
    * LINEAR-work scale path ([[Similarity.knnGraphIvf]]), and the
    * PRIMARY name since round 9: a user asking for "the kNN graph"
    * gets the plan that survives 100 TB (2.4× per 10× input at the
    * probe), not the banded form whose candidates degrade toward
    * all-pairs on this corpus geometry (33×; see
    * [[simKnnGraphBanded]]). IVF cells cap candidate mass at
    * n × targetCellSize; nCentroids is auto-sized to ~√n — the flat
    * coarse quantizer's balance point: assignment costs n·cells·d and
    * candidate mass n·(n/cells)·d, so cells = √n puts BOTH at n^1.5·d
    * where the round-9 ×100 probe showed the old n/128 rule letting
    * the assignment term grow quadratically (29.6 s vs 17.4 s at
    * n = 200 k, measured). Past ~10⁷ rows the declared answer is a
    * trained/hierarchical quantizer, not a flat argmax.
    * Rows-only (centroid geometry not expressible in DuckDB);
    * recall vs the exact graph + exactness of emitted scores asserted
    * in DedupSimilaritySpec; [[simKnnGraphIvfTwins]] is the
    * oracle-gated sibling on the planted-twin corpus. */
  val simKnnGraph: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val nCells = math.max(8L,
      math.ceil(math.sqrt(emb.count().toDouble)).toLong).toInt
    Similarity.knnGraphIvf(emb, 5, nCells)
      .orderBy("src", "rk")
  }

  /** sim_knn_graph_ivf_twins: ORACLE-GATED IVF kNN graph (round-8
    * verdict ask #5) — the planted-corpus trick of [[simPairsLsh]]
    * applied to IVF: every vector gets an IDENTICAL twin (id + 10⁶,
    * same floats). An identical vector produces a bit-identical
    * centroid argmax, so each (v, twin) pair co-locates in one IVF cell
    * BY CONSTRUCTION — no near-boundary probability argument — and
    * v's exact top-1 neighbor (cosine 1.0; any natural exact duplicate
    * also co-locates for the same reason) is always in-cell. Hence
    * IVF top-1 ≡ exact top-1 deterministically, and DuckDB recomputes
    * the brute-force ranking over the same doubled corpus. Gates the
    * whole IVF pipeline end-to-end: k-means centroid determinism,
    * zero-shuffle assignment, in-cell candidate join, rescore grid,
    * window tie-breaks. */
  val simKnnGraphIvfTwins: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
    val twins = emb.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      col("embedding"))
    val u = emb.unionAll(twins)
    val nCells = math.max(8L, emb.count() / 64L).toInt
    Similarity.knnGraphIvf(u, 1, nCells)
      .orderBy("src", "rk")
  }

  val simKnnGraphIvfTwinsSql =
    """WITH u AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings),
      |p AS (
      |  SELECT a.vec_id AS src, b.vec_id AS dst, floor((
      |    list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS cosine
      |  FROM u a JOIN u b ON a.vec_id <> b.vec_id),
      |r AS (SELECT src, dst, cosine,
      |  row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rk
      |  FROM p)
      |SELECT src, dst, cosine, rk FROM r WHERE rk <= 1
      |ORDER BY src, rk""".stripMargin

  /** sim_knn_graph_banded_twins: ORACLE-GATED banded-SRP kNN — the
    * identical-twin construction applied to the BANDED path, so every
    * similarity family now has a gated member (exact / auto-LSH / IVF /
    * banded-LSH). An identical vector produces an identical SRP sketch
    * word-for-word, so each (v, twin) pair collides in EVERY band by
    * construction — candidate recall 1 on the cos-1.0 set, no
    * probability argument — and the exact rescore ranks the twin top-1
    * deterministically (natural cos ≤ 0.48 can't tie; any natural
    * exact-duplicate vector also shares all buckets). DuckDB recomputes
    * the brute-force top-1 ranking.
    *
    * The gate corpus is a deterministic 1-in-5 id slice: the twin
    * guarantee is PER VECTOR (its twin shares every band regardless of
    * what else is in the corpus), so the slice leaves the gate's
    * strength per planted pair untouched while keeping the banded
    * demonstrator's declared near-all-pairs candidate mass — this IS
    * the loose-regime path, 33×/10× by design, measured 10.5 s on the
    * full doubled sf0.1 corpus before the slice — out of the bench
    * floor. The full-corpus regime economics stay measured by
    * `sim_knn_graph_banded` and SCALE.md. */
  val simKnnGraphBandedTwins: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      .filter(col("vec_id") % 5 === 0)
    val twins = emb.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      col("embedding"))
    Similarity.knnGraph(emb.unionAll(twins), 1)
      .orderBy("src", "rk")
  }

  val simKnnGraphBandedTwinsSql =
    """WITH u AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
      |  WHERE vec_id % 5 = 0),
      |p AS (
      |  SELECT a.vec_id AS src, b.vec_id AS dst, floor((
      |    list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS cosine
      |  FROM u a JOIN u b ON a.vec_id <> b.vec_id),
      |r AS (SELECT src, dst, cosine,
      |  row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rk
      |  FROM p)
      |SELECT src, dst, cosine, rk FROM r WHERE rk <= 1
      |ORDER BY src, rk""".stripMargin

  /** sim_knn_exact: the brute-force kNN graph the LSH form is
    * recall-tested against, as its own oracle-gated query (round-7
    * verdict ask #2): top-5 neighbors of every vector under the
    * (cosine desc, dst asc) deterministic order, O(n²) by declaration —
    * DuckDB computes the identical all-pairs ranking. */
  val simKnnExact: Q = (s, dir) =>
    Similarity.knnGraphExact(Tables.embeddings(s, dir), 5)
      .orderBy("src", "rk")

  val simKnnExactSql =
    """WITH p AS (
      |  SELECT a.vec_id AS src, b.vec_id AS dst, floor((
      |    list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS cosine
      |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
      |r AS (SELECT src, dst, cosine,
      |  row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rk
      |  FROM p)
      |SELECT src, dst, cosine, rk FROM r WHERE rk <= 5
      |ORDER BY src, rk""".stripMargin

  /** sketch_source_sim: group-level content sketches — per-source MinHash
    * UNION signatures (fixed-width TypedImperativeAggregate merge; the
    * shuffle moves one 512-byte sketch per source, never documents),
    * then pairwise estimated Jaccard between sources. Rows-only (hash
    * family); the union identity is asserted exactly in SketchMergeSpec. */
  val sketchSourceSim: Q = (s, dir) => {
    import graft.plans.MinHashMerge
    val docs = Tables.documents(s, dir)
    val sigs = Dedup.minhashSignatures(docs, col("text"), col("doc_id"))
      .join(docs.select("doc_id", "source"), "doc_id")
    val merged = sigs.groupBy("source")
      .agg(MinHashMerge.minhashMerge(col("sig")).as("sig")).localCheckpoint(true)
    Dedup.verifyFromSignatures(
        merged.select(col("source").as("a_id")).crossJoin(
          broadcast(merged.select(col("source").as("b_id")))).filter(col("a_id") < col("b_id")),
        merged.withColumnRenamed("source", "doc_id"))
      .orderBy("a_id", "b_id")
  }

  /** sketch_source_sim_exact: the EXACT quantity [[sketchSourceSim]]'s
    * merged MinHash sketches estimate — pairwise Jaccard between the
    * sources' distinct 3-word-shingle SETS — as its own oracle-gated
    * query (until round 9 the group-sketch family had no gated member).
    * Shape: distinct (source, shingle) via one aggregate, then an
    * inverted-index self-join ON THE SHINGLE (posting lists are ≤
    * #sources long after the distinct, so the join is linear in
    * distinct shingles — never |source|² × |shingles|), then one
    * bounded size-join over the handful of source pairs. DuckDB
    * recomputes the identical set arithmetic. At 100 TB the distinct
    * is the only wide stage and runs map-side-combined on (source,
    * shingle); the sketch form stays the cheap path (one 512-byte
    * sketch per source over the wire), with this as its audit. */
  val sketchSourceSimExact: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val sh = TextOps.shingleRows(docs, col("text"), col("doc_id"), 3)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select("source", "sh").distinct()
      .localCheckpoint(true) // both self-join sides read the same blocks
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("a_id"), col("b.source").as("b_id"))
      .agg(count(lit(1)).as("ni"))
    inter
      .join(sizes.select(col("source").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("source").as("b_id"), col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        r4(col("ni") / (col("na") + col("nb") - col("ni"))).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  val sketchSourceSimExactSql =
    """WITH tk AS (SELECT doc_id, source, string_split(lower(text), ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT source, unnest(list_transform(
      |    range(1, greatest(len(t) - 2, 0) + 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM tk),
      |i AS (SELECT a.source AS a_id, b.source AS b_id, count(*) AS ni
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source GROUP BY 1, 2),
      |sz AS (SELECT source, count(*) AS n FROM sh GROUP BY 1)
      |SELECT a_id, b_id,
      |  floor((ni * 1.0 / (sa.n + sb.n - ni)) * 10000 + 0.5) / 10000 AS jaccard
      |FROM i JOIN sz sa ON i.a_id = sa.source JOIN sz sb ON i.b_id = sb.source
      |ORDER BY a_id, b_id""".stripMargin

  // ---- text analysis ------------------------------------------------------

  val textTokens: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(100)

  val textTokensSql =
    """SELECT token, count(*) AS n FROM (
      |  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents) t
      |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin

  val textStats: Q = (s, dir) =>
    Tables.documents(s, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        r4(avg("n_chars")).as("avg_chars"),
        r4(expr("percentile(n_chars, 0.5)")).as("med_chars"))
      .orderBy("lang")

  val textStatsSql =
    """SELECT lang, count(*) AS n_docs, floor((avg(n_chars)) * 10000 + 0.5) / 10000 AS avg_chars,
      |  floor((quantile_cont(n_chars, 0.5)) * 10000 + 0.5) / 10000 AS med_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** curate_boilerplate_phrases: repeated-phrase boilerplate detection
    * (round 10) — the CCNet/RefinedWeb-style signal: a 5-gram occurring
    * in ≥ 3 DISTINCT documents is boilerplate (template text, headers,
    * licence blurbs — also the memorization-risk phrases Lee et al.'s
    * dedup work targets); per doc report total 5-grams, boilerplate
    * occurrences and the r4 fraction. Docs shorter than 5 tokens carry
    * zero grams and are excluded (same rule both engines).
    *
    * Scale shape: one explode pass builds the gram stream; the common
    * set is found on the DISTINCT (doc, gram) projection (so a phrase
    * spammed inside ONE doc never qualifies); the occurrence count is a
    * gram-co-keyed join — vocabulary-sized sides, never corpus×corpus. */
  val curateBoilerplatePhrases: Q = (s, dir) =>
    Dedup.boilerplatePhrases(Tables.documents(s, dir), col("text"),
        col("doc_id"), n = 5, minDocs = 3)
      .orderBy("doc_id")

  val curateBoilerplatePhrasesSql =
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |ok AS (SELECT doc_id, t FROM toks WHERE len(t) >= 5),
      |g AS (SELECT doc_id, list_aggregate(t[i:i+4], 'string_agg', ' ') AS gram
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i FROM ok)),
      |common AS (SELECT gram FROM (
      |    SELECT gram, count(*) AS nd FROM (SELECT DISTINCT doc_id, gram FROM g)
      |    GROUP BY 1) WHERE nd >= 3),
      |b AS (SELECT g.doc_id, count(*) AS n_boiler
      |  FROM g JOIN common USING (gram) GROUP BY 1)
      |SELECT ok.doc_id, CAST(len(ok.t) - 4 AS BIGINT) AS n_grams,
      |  CAST(coalesce(b.n_boiler, 0) AS BIGINT) AS n_boiler,
      |  floor((CAST(coalesce(b.n_boiler, 0) AS DOUBLE) / (len(ok.t) - 4)) * 10000 + 0.5) / 10000
      |    AS boiler_frac
      |FROM ok LEFT JOIN b ON b.doc_id = ok.doc_id
      |ORDER BY ok.doc_id""".stripMargin

  /** text_readability: Flesch reading-ease per document from three
    * deterministic integer counts — words (the shared whitespace
    * tokenizer), sentences (non-overlapping `[.!?]+` runs, floored at
    * 1), syllables (vowel-group runs `[aeiouy]+` over the lowercased
    * text, the standard heuristic). FRE = 206.835 − 1.015·(w/s) −
    * 84.6·(y/w), constants as shared literals, two IEEE divisions on
    * exact integers, r4-gridded — the curation-side readability band
    * filter (too-low = noise/legalese, too-high = fragment soup) beside
    * `text_quality`'s shape score. Scale: one narrow codegen projection,
    * zero shuffle bar the gate's ORDER BY. */
  val textReadability: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_words"),
        greatest(lit(1L), regexp_count(col("text"), lit("[.!?]+")).cast("long"))
          .as("n_sentences"),
        regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
          .as("n_syllables"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"),
        r4(lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
          - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")))
          .as("fre"))
      .orderBy("doc_id")

  val textReadabilitySql =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words,
      |    greatest(CAST(1 AS BIGINT), CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
      |  FROM documents)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  floor((206.835
      |    - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
      |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)) * 10000 + 0.5) / 10000 AS fre
      |FROM t WHERE n_words > 0 ORDER BY doc_id""".stripMargin

  /** text_quality: transcendental-free quality score (TextOps.qualityScore)
    * — formula replicated exactly in the oracle. */
  val textQuality: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).as("n_tokens"),
        TextOps.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  val textQualitySql =
    """WITH t AS (SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
      |    CAST(length(text) AS DOUBLE) AS n_chars FROM documents)
      |SELECT doc_id, n_tokens,
      |  floor(((n_tokens / (n_tokens + 50.0)) *
      |    (1.0 - abs((n_chars - (n_tokens - 1)) / n_tokens - 6.0)
      |         / (abs((n_chars - (n_tokens - 1)) / n_tokens - 6.0) + 10.0))) * 10000 + 0.5) / 10000 AS quality
      |FROM t ORDER BY doc_id""".stripMargin

  /** text_entropy: Shannon entropy (bits/char) of each document's
    * code-point distribution — the classic "natural text vs repetitive
    * filler vs random noise" quality gate that complements the
    * token-level signals (`text_quality`'s length/shape score,
    * `text_repetition`'s n-gram fractions): boilerplate collapses the
    * CHARACTER distribution even when token stats look healthy.
    *
    * Scale shape: ZERO shuffle bar the gate's ORDER BY — per-row
    * [[graft.plans.TextKernels.charEntropyBits]] codegen kernel (one
    * exact count pass per doc, Σ in ascending-code-point order for
    * cross-run determinism) instead of exploding the corpus into
    * per-character rows and shuffling them through a groupBy — the
    * explode form the ORACLE uses is exactly the shape this kernel
    * exists to avoid. Transcendental note (§7.4): ln on both engines is
    * the platform libm; the r4 grid absorbs ulp drift, the same
    * contract `text_ngram_lm`'s cross-entropy already gates. */
  val textEntropy: Q = (s, dir) => {
    import graft.plans.TextExpressions
    Tables.documents(s, dir)
      .select(col("doc_id"),
        r4(TextExpressions.charEntropy(col("text"))).as("entropy_bits"))
      .orderBy("doc_id")
  }

  val textEntropySql =
    """WITH ch AS (
      |  SELECT doc_id, c, count(*) AS cnt
      |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
      |  GROUP BY doc_id, c),
      |s AS (
      |  SELECT doc_id, CAST(sum(cnt) AS DOUBLE) AS n,
      |    sum(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))) AS slc
      |  FROM ch GROUP BY doc_id)
      |SELECT doc_id,
      |  floor(((ln(n) - slc / n) / ln(2)) * 10000 + 0.5) / 10000 AS entropy_bits
      |FROM s ORDER BY doc_id""".stripMargin

  /** text_repetition: the Gopher/MassiveText repetition signals (Rae et
    * al. 2021, §A1.1 — reimplemented from the paper's published rules,
    * not any code) — per document and per n-gram order (2 and 3):
    * total n-gram occurrences, the fraction held by the MOST FREQUENT
    * n-gram, and the fraction held by n-grams occurring more than once.
    * High values flag boilerplate/spam ("batch batch batch...") that
    * perplexity filters miss; these are THE standard pre-training
    * repetition gates.
    *
    * Scale shape: ZERO shuffle (bar the gate's ORDER BY) — the statistic
    * is per-document, so it is computed per-row by the
    * [[graft.plans.TextKernels.repetitionStats]] codegen kernel (one
    * exact hash-count pass over the doc's grams, byte-compared keys)
    * instead of exploding every gram and shuffling the full string corpus
    * through a (doc_id, gram_n, gram) groupBy. Both n-gram orders ride
    * one scan via an inline 2-element array; per-row memory is bounded by
    * the longest document. (The explode+groupBy form this replaced was
    * 5.1 s at sf0.1 — the gram shuffle WAS the query; an `aggregate`-HOF
    * run-length fold was 32 s — per-element interpreted lambdas. The
    * kernel is the only per-row form that is also FAST.) */
  val textRepetition: Q = (s, dir) => {
    import graft.plans.TextExpressions
    val docs = Tables.documents(s, dir)
    def stats(n: Int) = struct(lit(n).as("gram_n"),
      TextExpressions.repetitionStats(col("text"), n).as("st"))
    docs.select(col("doc_id"), explode(array(stats(2), stats(3))).as("s"))
      .filter(col("s.st.n_grams") > 0) // docs with < n tokens have no row
      .select(col("doc_id"), col("s.gram_n").as("gram_n"),
        col("s.st.n_grams").as("n_grams"),
        r4(col("s.st.max_c") / col("s.st.n_grams")).as("top_frac"),
        r4(col("s.st.dup_c") / col("s.st.n_grams")).as("dup_frac"))
      .orderBy("doc_id", "gram_n")
  }

  val textRepetitionSql =
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |g2 AS (SELECT doc_id, 2 AS gram_n, t, unnest(range(1, len(t))) AS i FROM toks),
      |g3 AS (SELECT doc_id, 3 AS gram_n, t, unnest(range(1, len(t) - 1)) AS i FROM toks),
      |grams AS (
      |  SELECT doc_id, gram_n, t[i] || ' ' || t[i + 1] AS gram FROM g2
      |  UNION ALL
      |  SELECT doc_id, gram_n, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS gram FROM g3),
      |counts AS (SELECT doc_id, gram_n, gram, count(*) AS c
      |           FROM grams GROUP BY doc_id, gram_n, gram)
      |SELECT doc_id, gram_n, CAST(sum(c) AS BIGINT) AS n_grams,
      |  floor((max(c) * 1.0 / sum(c)) * 10000 + 0.5) / 10000 AS top_frac,
      |  floor((sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c)) * 10000 + 0.5) / 10000 AS dup_frac
      |FROM counts GROUP BY doc_id, gram_n ORDER BY doc_id, gram_n""".stripMargin

  /** text_ngram_lm: CCNet-style language-model quality scoring (Wenzek et
    * al. 2020's perplexity gate, with the corpus itself as the LM) — per
    * document, the cross-entropy under the corpus UNIGRAM model:
    * `H(d) = ln N − (1/|d|) Σ_w ln c(w)`. Common-word documents score
    * low (fluent/boilerplate), rare-word soup scores high; the standard
    * cheap proxy for "is this document language-like" when a trained LM
    * isn't on the cluster.
    *
    * Scale shape: the vocabulary aggregate is the only corpus-wide
    * shuffle and collapses to O(vocab); the scoring join BROADCASTS the
    * vocabulary (a classic dim table — swap to a shuffle join only past
    * ~100 M types), the total-token count rides a 1-row broadcast cross
    * join, and the per-doc aggregate is co-keyed with the explode. */
  val textNgramLm: Q = (s, dir) => {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("c"))
    val total = tok.agg(count(lit(1)).as("n_total"))
    tok.join(broadcast(vocab), "token")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(log(col("c"))).as("sum_log_c"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"),
        r4(log(col("n_total")) - col("sum_log_c") / col("n_tokens")).as("cross_entropy"))
      .orderBy("doc_id")
  }

  val textNgramLmSql =
    """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
      |vocab AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
      |total AS (SELECT count(*) AS n_total FROM tok),
      |d AS (SELECT t.doc_id, count(*) AS n_tokens, sum(ln(v.c)) AS sum_log_c
      |      FROM tok t JOIN vocab v USING (token) GROUP BY t.doc_id)
      |SELECT doc_id, n_tokens,
      |  floor((ln(n_total) - sum_log_c / n_tokens) * 10000 + 0.5) / 10000 AS cross_entropy
      |FROM d, total ORDER BY doc_id""".stripMargin

  /** pipeline_quality_filter: the quality-gate composition — every
    * document is scored by the three signals ([[textQuality]]'s rational
    * score, [[textRepetition]]'s duplicated-2-gram fraction,
    * [[textNgramLm]]'s unigram cross-entropy) and attributed to its
    * FIRST failing gate (low_quality → repetitive → rare_soup → kept),
    * rolled up per source. This is the accounting view a curation run
    * ships with: how much of each source survived, and why the rest fell.
    *
    * Thresholds are calibrated on the fixture (quality ≥ 0.35 ≈ p25,
    * dup ≤ 0.15 ≈ p93, H ≤ 3.41 ≈ p90) and compare the ROUNDED value on
    * both engines (SURVEY §7.4: never threshold an unrounded double).
    *
    * Scale shape: quality and repetition are per-row (codegen kernels,
    * zero shuffle); only the corpus-relative cross-entropy pays a token
    * explode + doc_id aggregate, with its vocabulary and total sides
    * broadcast. One doc_id join, then a tiny per-source rollup. */
  val pipelineQualityFilter: Q = (s, dir) => {
    import graft.plans.TextExpressions
    val docs = Tables.documents(s, dir)
    // quality + repetition are PER-ROW signals: the rational score and
    // the duplicated-2-gram fraction (repetitionStats codegen kernel —
    // the same swap that took text_repetition 5.1 s → 0.3 s; the gram
    // corpus is never exploded or shuffled) ride one narrow projection.
    // Only the cross-entropy signal is genuinely corpus-relative
    // (vocabulary counts), so only the token explode below pays a
    // shuffle — and its vocabulary/total sides broadcast.
    val base = docs
      .select(col("doc_id"), col("source"),
        r4(TextOps.qualityScore(col("text"))).as("q"),
        TextExpressions.repetitionStats(col("text"), 2).as("st"))
      .select(col("doc_id"), col("source"), col("q"),
        // a doc with < 2 tokens has zero 2-grams: ANSI mode (Spark 4
        // default) throws on 0/0, and the oracle's LEFT JOIN + coalesce
        // scores such docs dup = 0.0 — mirror that, don't divide
        r4(when(col("st.n_grams") > 0, col("st.dup_c") / col("st.n_grams"))
          .otherwise(lit(0.0))).as("dup"))
    val tok = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("c"))
    val total = tok.agg(count(lit(1)).as("n_total"))
    val xent = tok.join(broadcast(vocab), "token")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(log(col("c"))).as("slc"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), r4(log(col("n_total")) - col("slc") / col("n_tokens")).as("h"))
    base.join(xent, Seq("doc_id"))
      .select(col("source"),
        when(col("q") < 0.35, "low_quality")
          .when(coalesce(col("dup"), lit(0.0)) > 0.15, "repetitive")
          .when(col("h") > 3.41, "rare_soup")
          .otherwise("kept").as("verdict"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("verdict") === "kept", 1)).as("n_kept"),
        count(when(col("verdict") === "low_quality", 1)).as("n_low_quality"),
        count(when(col("verdict") === "repetitive", 1)).as("n_repetitive"),
        count(when(col("verdict") === "rare_soup", 1)).as("n_rare_soup"))
      .orderBy("source")
  }

  val pipelineQualityFilterSql =
    """WITH t AS (SELECT doc_id, source,
      |    CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
      |    CAST(length(text) AS DOUBLE) AS n_chars FROM documents),
      |base AS (SELECT doc_id, source,
      |  floor(((n_tokens / (n_tokens + 50.0)) *
      |    (1.0 - abs((n_chars - (n_tokens - 1)) / n_tokens - 6.0)
      |         / (abs((n_chars - (n_tokens - 1)) / n_tokens - 6.0) + 10.0))) * 10000 + 0.5) / 10000 AS q
      |  FROM t),
      |toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |g2 AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram
      |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)),
      |gc AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY doc_id, gram),
      |dup2 AS (SELECT doc_id,
      |  floor((sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c)) * 10000 + 0.5) / 10000 AS dup
      |  FROM gc GROUP BY doc_id),
      |tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
      |vocab AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
      |total AS (SELECT count(*) AS n_total FROM tok),
      |xent AS (SELECT d.doc_id,
      |  floor((ln(n_total) - d.slc / d.n_tokens) * 10000 + 0.5) / 10000 AS h
      |  FROM (SELECT t.doc_id, count(*) AS n_tokens, sum(ln(v.c)) AS slc
      |        FROM tok t JOIN vocab v USING (token) GROUP BY t.doc_id) d, total),
      |verdicts AS (
      |  SELECT base.source,
      |    CASE WHEN base.q < 0.35 THEN 'low_quality'
      |         WHEN coalesce(dup2.dup, 0.0) > 0.15 THEN 'repetitive'
      |         WHEN xent.h > 3.41 THEN 'rare_soup'
      |         ELSE 'kept' END AS verdict
      |  FROM base LEFT JOIN dup2 USING (doc_id) JOIN xent USING (doc_id))
      |SELECT source, count(*) AS n_docs,
      |  count(CASE WHEN verdict = 'kept' THEN 1 END) AS n_kept,
      |  count(CASE WHEN verdict = 'low_quality' THEN 1 END) AS n_low_quality,
      |  count(CASE WHEN verdict = 'repetitive' THEN 1 END) AS n_repetitive,
      |  count(CASE WHEN verdict = 'rare_soup' THEN 1 END) AS n_rare_soup
      |FROM verdicts GROUP BY source ORDER BY source""".stripMargin

  /** text_pii_scrub: PII redaction — the pre-training hygiene pass that
    * strips emails and phone numbers before a corpus ships. Two global
    * regex replaces per row, pure projection: zero shuffle, codegen'd,
    * embarrassingly parallel at 100 TB. The fixture has no PII, so the
    * rows are built deterministically from customer columns and then
    * scrubbed; the oracle applies the identical patterns via DuckDB's
    * RE2 (`'g'` = Spark's replace-all default). */
  val textPiiScrub: Q = (s, dir) =>
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        concat(col("c_name"), lit(" <"), lower(col("c_name")), lit("@example.com> tel 555-"),
          lpad(pmod(col("c_custkey"), lit(10000L)).cast("string"), 4, "0"),
          lit(" segment "), col("c_mktsegment")).as("raw"))
      .select(col("c_custkey"),
        regexp_replace(
          regexp_replace(col("raw"), "[A-Za-z0-9._%+#-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
          "\\b555-[0-9]{4}\\b", "[PHONE]").as("scrubbed"))
      .orderBy("c_custkey")

  val textPiiScrubSql =
    """WITH raw AS (
      |  SELECT c_custkey,
      |    c_name || ' <' || lower(c_name) || '@example.com> tel 555-'
      |      || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
      |      || ' segment ' || c_mktsegment AS raw
      |  FROM customer)
      |SELECT c_custkey,
      |  regexp_replace(regexp_replace(raw,
      |    '[A-Za-z0-9._%+#-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |    '\b555-[0-9]{4}\b', '[PHONE]', 'g') AS scrubbed
      |FROM raw ORDER BY c_custkey""".stripMargin

  val textTokenCount: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).as("ws_tokens"),
        TextOps.regexTokenCount(col("text")).as("re_tokens"))
      .orderBy("doc_id")

  val textTokenCountSql =
    """SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS INT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS re_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** bpe_merges: train a REAL byte-pair-encoding tokenizer on the corpus
    * ([[graft.operators.Bpe]], Sennrich et al. 2016) and emit the learned
    * merge table. Distributed word-frequency aggregation (the only
    * corpus-scale stage) → bounded top-V collect → deterministic driver
    * merge loop. Rows-only: iterative argmax-and-retokenize is not
    * SQL-expressible; BpeSpec pins the merges against the paper's
    * hand-computed example, determinism, and roundtrip identity. */
  val bpeMerges: Q = (s, dir) => {
    val merges = Bpe.train(Tables.documents(s, dir), "text",
      nMerges = 200, maxWords = 20000)
    Bpe.mergesFrame(s, merges).orderBy("rank")
  }

  /** bpe_encode: apply the trained tokenizer corpus-wide — broadcast
    * rank table, zero-shuffle per-row greedy encode (the shape that
    * tokenizes 100 TB: train once on bounded word stats, encode as a
    * narrow map over every shard). Output is per-doc subword count plus
    * the first 8 tokens as an audit preview. */
  val bpeEncode: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val merges = Bpe.train(docs, "text", nMerges = 200, maxWords = 20000)
    Bpe.encode(docs, "text", merges, "bpe")
      .select(col("doc_id"),
        size(col("bpe")).cast("int").as("n_bpe_tokens"),
        concat_ws("|", slice(col("bpe"), 1, 8)).as("head_tokens"))
      .orderBy("doc_id")
  }

  /** The DECLARED merge table for `bpe_encode_fixed` — the first 12
    * merges the trainer learns on the sf0.001 corpus, frozen as a
    * literal (the "load a pretrained tokenizer" deployment shape).
    * Properly ordered by construction (training order) and alias-free
    * (no later merge's product equals an earlier merge's operand, no
    * duplicate products — audited), so the greedy rank-priority encode
    * is EQUIVALENT to applying the merges sequentially in rank order,
    * one leftmost-nonoverlapping pass each: a single pass always
    * eliminates its pair (the fused symbol l+r can recreate (l,r) only
    * if l+r == l or l+r == r, impossible), and a later merge can mint a
    * new occurrence of an earlier pair only via aliasing. That
    * equivalence is what makes the oracle possible: DuckDB replays the
    * merges as an unrolled replace() chain over a '|'-delimited symbol
    * string. */
  private val fixedBpeMerges: Seq[Bpe.Merge] = Seq(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"), ("a", "n"), ("c", "an")
  ).zipWithIndex.map { case ((l, r), i) => Bpe.Merge(i, l, r) }

  /** bpe_encode_fixed: greedy BPE encode of the corpus under the
    * DECLARED 12-merge table above ([[graft.operators.Bpe.encodeWord]]
    * semantics — rank-priority, leftmost-nonoverlapping) — the round-10
    * oracle-gated BPE family member (verdict ask #3). Same broadcast-
    * table zero-shuffle encode plan as `bpe_encode`; only the merge
    * table is a frozen literal instead of trained per-run, exactly how
    * a production pipeline tokenizes 100 TB with a pretrained vocab.
    * The oracle replays the merge chain in DuckDB (per word:
    * '|'-delimit the characters, then one replace('|l|r|','|lr|') per
    * merge in rank order — equivalence argued and audited above, and
    * the corpus is pure lowercase a-z + space so the delimiter is
    * collision-free). */
  val bpeEncodeFixed: Q = (s, dir) =>
    Bpe.encode(Tables.documents(s, dir), "text", fixedBpeMerges, "bpe")
      .select(col("doc_id"),
        size(col("bpe")).cast("int").as("n_bpe_tokens"),
        concat_ws("|", slice(col("bpe"), 1, 8)).as("head_tokens"))
      .orderBy("doc_id")

  val bpeEncodeFixedSql: String = {
    // Each merge's replace is applied TWICE (ADVICE r10 #2): adjacent
    // occurrences share the middle '|' ('|e|r|e|r|'), so a single
    // non-overlapping scan merges occurrences 1,3,5,… of a run and
    // misses 2,4,… — Spark's applyMergeOnce merges ALL leftmost-
    // nonoverlapping pairs in one pass. For l≠r the missed occurrences
    // are isolated between fused tokens after pass one, so a second
    // pass is EXACTLY the fixed point (a fused 'lr' token is a single
    // delimiter-free symbol and cannot mint a new '|l|r|'). l==r runs
    // have genuinely different nonoverlap geometry ('|a|a|a|a|a|'
    // pass-pair gives aa,a,aa where Spark gives aa,aa,a) — no such
    // merge exists in the declared table, and the require keeps any
    // future edit honest. BpeSpec property-tests this chain (same
    // non-overlapping String.replace semantics) against encodeWord on
    // adversarial 'rerere'-shaped words.
    require(fixedBpeMerges.forall(m => m.left != m.right),
      "the twice-replace oracle is only exact for left != right merges")
    val chain = fixedBpeMerges.foldLeft(
      "'|' || regexp_replace(w, '(.)', '\\1|', 'g')") { (acc, m) =>
      val pat = s"'|${m.left}|${m.right}|'"
      val rep = s"'|${m.left}${m.right}|'"
      s"replace(replace($acc, $pat, $rep), $pat, $rep)"
    }
    s"""WITH t AS (SELECT doc_id,
       |    flatten(list_transform(
       |      list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> ''),
       |      w -> list_filter(string_split($chain, '|'), x -> x <> ''))) AS toks
       |  FROM documents)
       |SELECT doc_id, CAST(len(toks) AS INT) AS n_bpe_tokens,
       |  array_to_string(toks[1:8], '|') AS head_tokens
       |FROM t ORDER BY doc_id""".stripMargin
  }

  /** text_vocab: corpus vocabulary build — explode tokens, count, keep
    * the top 50 by frequency (the first step of any tokenizer train /
    * coverage audit). Partial-aggregated explode+count, then
    * TakeOrderedAndProject — per-partition heaps, never a full sort.
    * Ties broken by token so both engines agree on the cut. */
  val textVocab: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(50)

  val textVocabSql =
    """WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
      |SELECT token, count(*) AS n FROM toks GROUP BY token
      |ORDER BY n DESC, token LIMIT 50""".stripMargin

  /** text_pmi_bigrams: collocation extraction — adjacent-token bigrams
    * scored by pointwise mutual information, PMI = ln(c_ab·N / (c_a·c_b))
    * with N the corpus token count (the corpus-LM simplification; the
    * contract). High-PMI pairs are multiword units ("new york") the
    * tokenizer/vocab steps should treat as one; c_ab ≥ 5 is the standard
    * sparse-count floor.
    *
    * Determinism: all counts are exact integers; both LONG products fit
    * exactly in double (< 2⁵³), so the score is ONE division + ONE libm
    * ln re-gridded to 1e-8 (the ngram-lm contract absorbs ln's ulp).
    *
    * Scale shape: bigram generation is a narrow HOF (no shuffle before
    * the count); the two count aggregates are map-side combined; c_a/c_b
    * attach by two vocab-sized co-keyed joins (never the corpus); N
    * rides a one-row broadcast. */
  def pmiBigrams(docs: org.apache.spark.sql.DataFrame, minCount: Long = 5L)
      : org.apache.spark.sql.DataFrame = {
    val toks = docs.select(TextOps.tokens(col("text")).as("t"))
    val uni = toks.select(explode(col("t")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val nTot = uni.agg(sum(col("c")).as("n_tokens"))
    val bigrams = toks.select(explode(
        when(size(col("t")) < 2, expr("array()")
            .cast("array<struct<w1:string,w2:string>>"))
          .otherwise(transform(sequence(lit(1), size(col("t")) - 1, lit(1)),
            i => struct(element_at(col("t"), i).as("w1"),
              element_at(col("t"), i + 1).as("w2"))))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    bigrams
      .join(uni.select(col("token").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("token").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(nTot))
      .select(concat(col("w1"), lit(" "), col("w2")).as("bigram"),
        col("c_ab"), col("c_a"), col("c_b"),
        graft.functions.Num.r8(log((col("c_ab") * col("n_tokens")).cast("double")
          / (col("c_a") * col("c_b")).cast("double"))).as("pmi"))
      .orderBy("bigram")
  }

  val textPmiBigrams: Q = (s, dir) => pmiBigrams(Tables.documents(s, dir))

  val textPmiBigramsSql =
    """WITH tk AS (SELECT string_split(lower(text), ' ') AS t FROM documents),
      |bi AS (
      |  SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
      |    i -> t[i] || ' ' || t[i+1])) AS bigram
      |  FROM tk),
      |bc AS (SELECT bigram, count(*) AS c_ab FROM bi GROUP BY bigram
      |  HAVING count(*) >= 5),
      |uni AS (SELECT unnest(t) AS token FROM tk),
      |uc AS (SELECT token, count(*) AS c FROM uni GROUP BY token),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM uc)
      |SELECT bc.bigram, bc.c_ab, ua.c AS c_a, ub.c AS c_b,
      |  floor(ln(CAST(bc.c_ab * n.n_tokens AS DOUBLE)
      |    / CAST(ua.c * ub.c AS DOUBLE)) * 100000000 + 0.5) / 100000000 AS pmi
      |FROM bc
      |JOIN uc ua ON ua.token = string_split(bc.bigram, ' ')[1]
      |JOIN uc ub ON ub.token = string_split(bc.bigram, ' ')[2]
      |CROSS JOIN n
      |ORDER BY bigram""".stripMargin

  /** text_tfidf_keywords: per-doc top-3 TF-IDF terms — the classic
    * keyword / salient-term extractor every corpus-exploration and
    * search-indexing pipeline needs (and the raw feature behind BM25's
    * idf, here in its document-facing form). idf = ln((N+1)/(df+1))
    * (the +1-smoothed variant, never negative since df ≤ N), quantized
    * ONCE per term to 10⁸ micro-units (the adamic_adar libm recipe), so
    * score = tf·idf_micro is pure BIGINT and the top-k order
    * (score DESC, term ASC) is integer-deterministic on both engines.
    *
    * Scale shape: tokenization is a narrow HOF; the (doc, term) tf
    * aggregate and the term-keyed df aggregate are both map-side
    * combined; df attaches by a vocab-sized CO-KEYED join on term
    * (never the corpus against itself; at 100 TB the vocab side
    * shuffles on the same key instead of broadcasting); N rides a
    * one-row broadcast; the per-doc top-3 is a rank-1..k window the
    * optimizer runs as WindowGroupLimit — partial top-k before the
    * doc-keyed exchange. */
  def tfidfKeywords(docs: org.apache.spark.sql.DataFrame, topK: Int = 3)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        floor(log((col("n_docs") + 1L).cast("double")
            / (col("df") + 1L).cast("double")) * 100000000L + 0.5)
          .cast("long").as("idf_micro"))
      .withColumn("score_micro", col("tf") * col("idf_micro"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .orderBy("doc_id", "rnk")
  }

  val textTfidfKeywords: Q = (s, dir) => tfidfKeywords(Tables.documents(s, dir))

  val textTfidfKeywordsSql =
    """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
      |  WHERE term <> '' GROUP BY doc_id, term),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
      |    CAST(floor(ln(CAST(n.n_docs + 1 AS DOUBLE)
      |      / CAST(dfreq.df + 1 AS DOUBLE)) * 100000000 + 0.5) AS BIGINT)
      |      AS idf_micro
      |  FROM tf JOIN dfreq ON dfreq.term = tf.term CROSS JOIN n),
      |rk AS (SELECT doc_id, term, tf, df, idf_micro,
      |    CAST(tf * idf_micro AS BIGINT) AS score_micro,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY tf * idf_micro DESC, term ASC) AS rnk
      |  FROM scored)
      |SELECT doc_id, term, tf, df, idf_micro, score_micro, CAST(rnk AS INT) AS rnk
      |FROM rk WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  /** text_hash_features: the hashing trick (HashingTF / Weinberger et
    * al. 2009) — each doc's bag-of-words folded into B=64 hashed count
    * buckets, emitted SPARSE as (doc_id, bucket, cnt): the fixed-width,
    * vocabulary-free feature map every downstream classifier/regressor
    * consumes, with collisions summing (the trick's contract). The
    * bucket is an md5-prefix integer mod B — cross-engine deterministic
    * where engine-native hash functions are not (the `sample_hash`
    * coordinate discipline applied to terms).
    *
    * Scale shape: tokenize + bucket are ONE narrow codegen projection
    * (no vocabulary table, no join — the hashing trick's whole point at
    * 100 TB); the (doc, bucket) count is a single map-side-combined
    * aggregate bounded at 64 rows per doc. */
  def hashFeatures(docs: org.apache.spark.sql.DataFrame, buckets: Int = 64)
      : org.apache.spark.sql.DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .withColumn("bucket",
        pmod(conv(substring(md5(concat(col("term"), lit(":hf")).cast("binary")),
          1, 12), 16, 10).cast("long"), lit(buckets.toLong)))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("doc_id", "bucket")
  }

  val textHashFeatures: Q = (s, dir) => hashFeatures(Tables.documents(s, dir))

  val textHashFeaturesSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents)
      |SELECT doc_id,
      |  CAST('0x' || substr(md5(term || ':hf'), 1, 12) AS BIGINT) % 64 AS bucket,
      |  count(*) AS cnt
      |FROM tok WHERE term <> ''
      |GROUP BY doc_id, bucket ORDER BY doc_id, bucket""".stripMargin

  /** text_zipf_fit: the Zipf log-log slope of the top-500 term
    * frequencies — OLS of ln(count) on ln(rank): natural corpora sit
    * near −1; a slope far from it flags synthetic/templated text or a
    * broken tokenizer (the corpus-level signature beside per-doc quality
    * scores). ln(rank)/ln(count) are quantized ONCE to 10⁴ micro-units,
    * so all five OLS sums are merge-order-proof BIGINT (products < 2⁵³
    * at V=500); slope is one r8 IEEE division, intercept one short IEEE
    * chain ON the gridded slope.
    *
    * Scale shape: the vocab count is map-side combined; the top-V cut
    * is TakeOrderedAndProject (never a global sort); the rank window
    * runs on the ≤V-row frame — a bounded single partition by
    * construction. */
  def zipfFit(docs: org.apache.spark.sql.DataFrame, topV: Int = 500)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs.select(explode(TextOps.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term").asc).limit(topV)
    val w = Window.orderBy(col("c").desc, col("term").asc) // <= topV rows
    val pts = counts.withColumn("r", row_number().over(w))
      .select(
        floor(log(col("r").cast("double")) * 10000L + 0.5).cast("long").as("x"),
        floor(log(col("c").cast("double")) * 10000L + 0.5).cast("long").as("y"))
    pts
      .agg(count(lit(1)).as("n_terms"), sum("x").as("s_x"), sum("y").as("s_y"),
        sum(col("x") * col("y")).as("s_xy"), sum(col("x") * col("x")).as("s_xx"))
      .select(col("n_terms"), col("s_x"), col("s_y"), col("s_xy"), col("s_xx"),
        (col("n_terms") * col("s_xy") - col("s_x") * col("s_y")).as("num"),
        (col("n_terms") * col("s_xx") - col("s_x") * col("s_x")).as("den"))
      .select(col("n_terms"), col("s_x"), col("s_y"), col("s_xy"), col("s_xx"),
        col("num"), col("den"),
        when(col("den") > 0, graft.functions.Num.r8(
            col("num").cast("double") / col("den").cast("double")))
          .otherwise(lit(0.0)).as("slope"))
      .withColumn("intercept", graft.functions.Num.r8(
        (col("s_y").cast("double") - col("slope") * col("s_x").cast("double"))
          / (col("n_terms").cast("double") * 10000.0)))
  }

  val textZipfFit: Q = (s, dir) => zipfFit(Tables.documents(s, dir))

  val textZipfFitSql: String =
    """WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |tc AS (SELECT term, count(*) AS c FROM tok WHERE term <> ''
      |  GROUP BY term),
      |top AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS r
      |  FROM tc ORDER BY c DESC, term LIMIT 500),
      |pts AS (SELECT
      |    CAST(floor(ln(CAST(r AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(ln(CAST(c AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS y
      |  FROM top),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
      |    CAST(sum(x) AS BIGINT) AS s_x, CAST(sum(y) AS BIGINT) AS s_y,
      |    CAST(sum(x * y) AS BIGINT) AS s_xy,
      |    CAST(sum(x * x) AS BIGINT) AS s_xx FROM pts),
      |b AS (SELECT n_terms, s_x, s_y, s_xy, s_xx,
      |    CAST(n_terms * s_xy - s_x * s_y AS BIGINT) AS num,
      |    CAST(n_terms * s_xx - s_x * s_x AS BIGINT) AS den,
      |    CASE WHEN n_terms * s_xx - s_x * s_x > 0 THEN
      |      floor(CAST(n_terms * s_xy - s_x * s_y AS DOUBLE)
      |        / CAST(n_terms * s_xx - s_x * s_x AS DOUBLE) * 100000000 + 0.5)
      |        / 100000000
      |    ELSE 0.0 END AS slope
      |  FROM a)
      |SELECT n_terms, s_x, s_y, s_xy, s_xx, num, den, slope,
      |  floor((CAST(s_y AS DOUBLE) - slope * CAST(s_x AS DOUBLE))
      |    / (CAST(n_terms AS DOUBLE) * 10000) * 100000000 + 0.5) / 100000000
      |    AS intercept
      |FROM b""".stripMargin

  /** curate_ngram_ppl: per-doc BIGRAM cross-entropy under the corpus
    * bigram LM with add-one smoothing — the CCNet/KenLM-style
    * perplexity quality filter one order up from [[textNgramLm]]'s
    * unigram form: H(d) = −(1/|bigrams|) Σ ln p̂(w₂|w₁), p̂(w₂|w₁) =
    * (c(w₁w₂)+1)/(c(w₁)+V). Low H = fluent/common phrasing; high H =
    * rare-soup or shuffled text that unigram stats can't see (every
    * word common, no pair ever seen).
    *
    * Exactness: every distinct bigram's log-prob is quantized ONCE to
    * 10⁸ micro-units (the dq_drift_psi libm recipe), so per-doc sums
    * are merge-order-proof BIGINT; the mean+sign chain is mirrored
    * token for token and lands on the 1e-8 grid. Docs with fewer than
    * two tokens have no bigram distribution and drop (both engines, by
    * the same inner join).
    *
    * Scale shape: bigram generation is a narrow HOF (zero shuffle
    * pre-count); the bigram-count and unigram-count aggregates are
    * map-side combined; the weight table is bigram-VOCAB-sized and
    * joins the doc-bigram stream CO-KEYED on (w1, w2) — at 100 TB that
    * table exceeds broadcast and the equi-join shuffles both sides on
    * the same key, never the corpus against itself; V rides a 1-row
    * broadcast. */
  def ngramPpl(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
    val uni = toks.select(explode(col("t")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c1"))
    val vsize = uni.agg(count(lit(1)).as("v"))
    val docBg = toks.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("t")) - 1, lit(1)),
          i => struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val wt = docBg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .join(uni.select(col("token").as("w1"), col("c1")), "w1")
      .crossJoin(broadcast(vsize))
      .select(col("w1"), col("w2"),
        floor(log((col("c12") + lit(1L)).cast("double")
          / (col("c1") + col("v")).cast("double"))
          * lit(100000000L) + lit(0.5)).cast("long").as("wq"))
    docBg.join(wt, Seq("w1", "w2"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_bigrams"), sum("wq").as("sum_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_micro"),
        graft.functions.Num.r8((-col("sum_micro")).cast("double")
          / col("n_bigrams").cast("double") / lit(100000000.0))
          .as("cross_entropy"))
      .orderBy("doc_id")
  }

  val curateNgramPpl: Q = (s, dir) => ngramPpl(Tables.documents(s, dir))

  val curateNgramPplSql: String =
    """WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t
      |  FROM documents),
      |uc AS (SELECT token, count(*) AS c1
      |  FROM (SELECT unnest(t) AS token FROM tk) GROUP BY token),
      |v AS (SELECT count(*) AS v FROM uc),
      |db AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      range(1, greatest(len(t) - 1, 0) + 1),
      |      i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS s
      |    FROM tk)),
      |wt AS (SELECT bc.w1, bc.w2,
      |    CAST(floor(ln(CAST(bc.c12 + 1 AS DOUBLE)
      |      / CAST(uc.c1 + v.v AS DOUBLE)) * 100000000 + 0.5) AS BIGINT) AS wq
      |  FROM (SELECT w1, w2, count(*) AS c12 FROM db GROUP BY 1, 2) bc
      |  JOIN uc ON uc.token = bc.w1 CROSS JOIN v)
      |SELECT d.doc_id, count(*) AS n_bigrams,
      |  CAST(sum(w.wq) AS BIGINT) AS sum_micro,
      |  floor((CAST(-sum(w.wq) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |    / 100000000.0) * 100000000 + 0.5) / 100000000 AS cross_entropy
      |FROM db d JOIN wt w ON d.w1 = w.w1 AND d.w2 = w.w2
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  /** text_vocab_approx: [[textVocab]] through the SpaceSaving
    * heavy-hitters aggregate ([[graft.plans.SpaceSavingAgg]]) — the
    * bounded-memory form whose buffers stay O(capacity) no matter how
    * many distinct items flow through (URLs, n-grams, ids). Oracle-gated
    * with the SAME SQL as text_vocab: with capacity (1024) above the
    * fixture's distinct-token count the sketch never evicts and is
    * provably exact; SketchMergeSpec asserts the approximate regime
    * (domain ≫ capacity) separately. */
  val textVocabApprox: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .agg(graft.plans.SpaceSaving.approxTopK(col("token"), 50, 1024).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.item").as("token"), col("t.est_count").as("n"))
      .orderBy(col("n").desc, col("token").asc)

  val textVocabApproxSql = textVocabSql

  /** sketch_hll_union: the distinct-count analogue of
    * [[sketchSourceSim]]'s MinHash unification — per-(source, lang)
    * Datasketches HLL sketches of the token space, UNIONED up to
    * per-source sketches, then estimated. This is how 100 TB keeps
    * distinct counts re-aggregatable: sketches are built once near the
    * data and every rollup level is a cheap fixed-width union, never a
    * re-scan. Rows-only (sketch internals aren't DuckDB-expressible);
    * the spec asserts union(estimates) vs exact distinct counts. */
  val sketchHllUnion: Q = (s, dir) => {
    val tokens = Tables.documents(s, dir)
      .select(col("source"), col("lang"),
        explode(TextOps.tokens(col("text"))).as("token"))
    val perCell = tokens.groupBy("source", "lang")
      .agg(expr("hll_sketch_agg(token, 12)").as("sk"))
    perCell.groupBy("source")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_distinct_tokens"),
        count(lit(1)).as("n_langs"))
      .orderBy("source")
  }

  /** sketch_hll_union_exact: the exact quantity [[sketchHllUnion]]'s
    * HLL rollup estimates — per-source distinct tokens and the
    * (source, lang) cell count — oracle-gated. Distinct-shuffle on
    * (source, token) with map-side combine; the sketch form remains the
    * re-aggregatable scale path, with this as its audit (the same
    * exact-vs-estimate pairing the spec asserts, lifted to the gate). */
  val sketchHllUnionExact: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("source"), col("lang"),
        explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("source")
      .agg(countDistinct(col("token")).as("distinct_tokens"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("source")

  val sketchHllUnionExactSql =
    """SELECT source, count(DISTINCT token) AS distinct_tokens,
      |  count(DISTINCT lang) AS n_langs
      |FROM (SELECT source, lang, unnest(string_split(lower(text), ' ')) AS token
      |      FROM documents) t
      |GROUP BY source ORDER BY source""".stripMargin

  /** sketch_cms_counts: Count-Min frequency estimates of the event-type
    * counts — the fourth sketch family member (HLL = distinct,
    * SpaceSaving = top-k, MinHash = similarity, CMS = point frequency),
    * via Spark's `count_min_sketch` aggregate (seeded ⇒ deterministic
    * under any row order — counter adds commute). ORACLE-GATED in the
    * exact regime, the `multimodal_dedup` argument: with 5 distinct keys
    * in a 20 001-wide sketch an overestimate needs a collision in EVERY
    * depth row (p ≈ 10⁻²⁶) — a collision would FAIL the gate, not hide.
    * The estimate query is a bounded ONE-ROW sketch fetch + 5 driver
    * lookups (the type domain is a literal); at 100 TB the sketch is
    * the mergeable fixed-width state, the scan is the only data pass. */
  val sketchCmsCounts: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val skBytes = ev
      .agg(expr("count_min_sketch(event_type, 0.0001d, 0.999d, 42)").as("sk"))
      .head().getAs[Array[Byte]](0) // one fixed-width row by construction
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val types = Seq("click", "error", "purchase", "signup", "view")
    val est = types.map(t => (t, cms.estimateCount(t))).toDF("event_type", "est")
    Tables.events(s, dir).groupBy("event_type")
      .agg(count(lit(1)).as("n_exact"))
      .join(broadcast(est), "event_type")
      .select(col("event_type"), col("n_exact"), col("est"))
      .orderBy("event_type")
  }

  val sketchCmsCountsSql =
    """SELECT event_type, count(*) AS n_exact, count(*) AS est
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** text_langid: Cavnar-Trenkle trigram-profile classifier trained on the
    * labeled fixture itself (rows-only; accuracy asserted in LangIdSpec). */
  val textLangid: Q = (s, dir) =>
    LangId.selfLabelPredict(Tables.documents(s, dir),
        col("text"), col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** text_langid_exact: ORACLE-GATED language-ID (round 9) — the same
    * Cavnar-Trenkle classifier with inverse-rank weights quantized to
    * integer micro-units ([[LangId.selfLabelPredictExact]]), so the
    * per-(doc, lang) score is exact long arithmetic and DuckDB
    * recomputes profile building, scoring, and the argmax tie-break
    * identically. The kernel-scored primary (`text_langid`) remains the
    * production path; this gates the family's semantics. */
  val textLangidExact: Q = (s, dir) =>
    LangId.selfLabelPredictExact(Tables.documents(s, dir),
        col("text"), col("doc_id"), col("lang"))
      .orderBy("doc_id")

  val textLangidExactSql =
    """WITH s AS (
      |  SELECT doc_id, lang, lower(text) AS t FROM documents
      |  WHERE length(lower(text)) >= 3),
      |g AS (
      |  SELECT doc_id, lang, substr(t, CAST(i AS INT), 3) AS gram
      |  FROM s, unnest(range(1, length(t) - 1)) AS r(i)),
      |counts AS (SELECT lang, gram, count(*) AS c FROM g GROUP BY 1, 2),
      |prof AS (
      |  SELECT lang AS p_lang, gram,
      |    CAST(floor(1000000.0 / rank + 0.5) AS BIGINT) AS wq
      |  FROM (SELECT lang, gram,
      |      row_number() OVER (PARTITION BY lang ORDER BY c DESC, gram) AS rank
      |    FROM counts)
      |  WHERE rank <= 200),
      |dc AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
      |sc AS (SELECT dc.doc_id, prof.p_lang, sum(prof.wq * dc.cnt) AS score
      |  FROM dc JOIN prof USING (gram) GROUP BY 1, 2),
      |best AS (SELECT doc_id, p_lang,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, p_lang DESC) AS rn
      |  FROM sc)
      |SELECT doc_id, p_lang AS pred_lang FROM best WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  /** text_fingerprint: winnowing fingerprints (rows-only — rolling
    * xxhash64 not expressible in DuckDB). Codegen kernel expression;
    * bit-identical to the HOF form (TextKernelsSpec). */
  val textFingerprint: Q = (s, dir) => {
    import graft.plans.TextExpressions
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(TextExpressions.winnowFingerprints(col("text"))).as("n_fp"),
        element_at(TextExpressions.winnowFingerprints(col("text")), 1).as("min_fp"))
      .orderBy("doc_id")
  }

  /** text_fingerprint_dedup: ORACLE-GATED winnowing — dedup by FULL
    * fingerprint-set identity (group on the winnow array, keep the min
    * doc_id), the document-level use of [[textFingerprint]]'s kernel.
    * Natural near-dup families cannot gate this (a small edit whose
    * char-grams are never window-minima leaves the selected set
    * unchanged — the FIXTURES.md §A0 lesson, which bites winnowing
    * exactly as it bites MinHash signatures), so the corpus is the
    * disjoint synthetic one: each doc's text is three md5 hex words
    * derived from its own id — any two distinct docs differ in ~96% of
    * characters, and full fingerprint-SET equality between them would
    * need every selected 8-gram hash to coincide (≪ 10⁻²⁰; a single
    * accidental shared gram, ~10⁻⁶ per pair, cannot flip set
    * equality). Identical-text twins (doc_id%2 == 0 → id + 10⁶) make
    * the gate non-vacuous: identical text ⇒ identical fingerprint
    * array, deterministically. DuckDB recomputes every doc's keeper as
    * the min doc_id sharing its text digest. The groupBy ships the
    * fingerprint arrays themselves (~w⁻¹ of the gram count, the point
    * of winnowing) — at 100 TB this is the standard fingerprint-dedup
    * shuffle, bounded by selection density, never by text. */
  val textFingerprintDedup: Q = (s, dir) => {
    import graft.plans.TextExpressions
    val ids = Tables.documents(s, dir).select("doc_id")
    def synth: org.apache.spark.sql.Column =
      concat_ws(" ",
        md5(concat(col("doc_id").cast("string"), lit(":a"))),
        md5(concat(col("doc_id").cast("string"), lit(":b"))),
        md5(concat(col("doc_id").cast("string"), lit(":c"))))
    val base = ids.select(col("doc_id"), synth.as("text"))
    val twins = base.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
    val docs = base.unionAll(twins)
    val fps = docs.select(col("doc_id"),
      TextExpressions.winnowFingerprints(col("text")).as("fp"))
    val keep = fps.groupBy("fp").agg(min(col("doc_id")).as("keep_id"))
    fps.join(keep, "fp")
      .select("doc_id", "keep_id")
      .orderBy("doc_id")
  }

  val textFingerprintDedupSql =
    """WITH ids AS (SELECT doc_id FROM documents),
      |u AS (
      |  SELECT doc_id,
      |    md5(md5(doc_id || ':a') || ' ' || md5(doc_id || ':b') || ' ' || md5(doc_id || ':c')) AS d
      |  FROM ids
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    md5(md5(doc_id || ':a') || ' ' || md5(doc_id || ':b') || ' ' || md5(doc_id || ':c')) AS d
      |  FROM ids WHERE doc_id % 2 = 0)
      |SELECT a.doc_id, min(b.doc_id) AS keep_id
      |FROM u a JOIN u b ON a.d = b.d
      |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin

  // ---- deterministic sampling / splits -------------------------------------

  /** sample_hash: content-hash 10% sample — deterministic, partition-
    * independent, engine-portable (oracle draws the IDENTICAL sample). */
  val sampleHash: Q = (s, dir) =>
    Sampling.hashSample(Tables.documents(s, dir), col("doc_id"), 0.1)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  /** sample_mixture: the corpus-mixture knob — per-source keep rates
    * (80% src0 / 50% src1 / 25% src2 / 10% long tail), decided by the
    * same engine-portable md5 threshold as sample_hash. One narrow
    * filter; the oracle draws the IDENTICAL mixture. */
  /** sample_token_budget: token-budget data mixing
    * ([[Sampling.tokenBudgetSample]]) — 5000 tokens per source, docs
    * taken in the reproducible md5-shuffle order, boundary doc kept.
    * Pure integer keep rule (stream offset < budget) — the mixing op a
    * training run specifies in tokens, beside `sample_mixture`'s
    * per-doc rates (round 10). */
  val sampleTokenBudget: Q = (s, dir) =>
    Sampling.tokenBudgetSample(
        Tables.documents(s, dir).select(col("doc_id"), col("source"),
          size(TextOps.tokens(col("text"))).as("n_tokens")),
        col("doc_id"), col("source"), col("n_tokens"), budget = 5000L)
      .orderBy("doc_id")

  val sampleTokenBudgetSql =
    """WITH t AS (SELECT doc_id, source,
      |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
      |    CAST('0x' || substr(md5(doc_id || ':budget'), 1, 12) AS BIGINT) AS u
      |  FROM documents),
      |o AS (SELECT doc_id, source, n_tokens,
      |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
      |  FROM t)
      |SELECT doc_id, source, n_tokens, cum_before FROM o
      |WHERE cum_before < 5000 ORDER BY doc_id""".stripMargin

  val sampleMixture: Q = (s, dir) =>
    Sampling.mixtureSample(Tables.documents(s, dir), col("doc_id"), col("source"),
        Seq("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.25), default = 0.1)
      .select("doc_id", "source")
      .orderBy("doc_id")

  val sampleMixtureSql =
    """SELECT doc_id, source FROM documents
      |WHERE md5(doc_id || ':s0') <
      |  CASE source
      |    WHEN 'src0' THEN 'cccccccccccccccccccccccccccccccc'
      |    WHEN 'src1' THEN '80000000000000000000000000000000'
      |    WHEN 'src2' THEN '40000000000000000000000000000000'
      |    ELSE '19999999999999999999999999999999' END
      |ORDER BY doc_id""".stripMargin

  /** sample_temperature_rank: the EXACT-count form of temperature
    * sampling ([[graft.operators.Sampling.temperatureSample]]) — keep
    * counts derived from the data (∝ n_s^0.5, head flattened),
    * selection by cross-engine hash rank. The oracle recomputes targets
    * AND the ranked selection, so both the arithmetic and the
    * per-source cut are gated row-for-row. SUFFIXED demonstrator
    * (round-10 rename, the r8 primary-binding rule): its per-source
    * rank window is a full shuffle+sort of the fact table — 48× at the
    * ×100 scale step vs the threshold form's 5.1× — so the primary
    * `sample_temperature` name binds the zero-shuffle threshold cut
    * below. */
  val sampleTemperatureRank: Q = (s, dir) =>
    Sampling.temperatureSample(Tables.events(s, dir).select("event_id", "event_type"),
        col("event_id"), col("event_type"), alpha = 0.5, keepRatio = 0.2)
      .orderBy("event_id")

  val sampleTemperatureRankSql =
    """WITH cnt AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
      |tot AS (SELECT CAST(floor(0.2 * CAST(sum(n) AS BIGINT) + 0.5) AS BIGINT) AS k,
      |    CAST(sum(CAST(floor(pow(n, 0.5) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS wq_sum
      |  FROM cnt),
      |tgt AS (SELECT c.event_type,
      |    least(c.n, CAST(floor(CAST(t.k AS DOUBLE)
      |      * CAST(CAST(floor(pow(c.n, 0.5) * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
      |      / CAST(t.wq_sum AS DOUBLE) + 0.5) AS BIGINT)) AS t
      |  FROM cnt c CROSS JOIN tot t),
      |ranked AS (SELECT event_id, event_type,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY md5(event_id || ':s0'), event_id) AS rn
      |  FROM events)
      |SELECT r.event_id, r.event_type FROM ranked r JOIN tgt USING (event_type)
      |WHERE r.rn <= tgt.t ORDER BY r.event_id""".stripMargin

  /** sample_temperature: α-balanced source mixture, PRIMARY binding =
    * the zero-shuffle threshold form ([[Sampling.temperatureSampleFast]];
    * promoted round 10 per the r8 "primary = scale-safe" rule) — same
    * integer-quantized α-balanced targets as the rank form, but
    * selection by per-source 48-bit md5-prefix threshold: the fact
    * table is never shuffled (no rank window), so the plan survives
    * 100 TB where the exact-rank form's per-source sort is the measured
    * scale-killer (48× vs 5.1× at the ×100 probe step). Oracle
    * recomputes targets, thresholds, and the hex-prefix comparison
    * exactly. */
  val sampleTemperature: Q = (s, dir) =>
    Sampling.temperatureSampleFast(Tables.events(s, dir).select("event_id", "event_type"),
        col("event_id"), col("event_type"), alpha = 0.5, keepRatio = 0.2)
      .orderBy("event_id")

  val sampleTemperatureSql =
    """WITH cnt AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
      |tot AS (SELECT CAST(floor(0.2 * CAST(sum(n) AS BIGINT) + 0.5) AS BIGINT) AS k,
      |    CAST(sum(CAST(floor(pow(n, 0.5) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS wq_sum
      |  FROM cnt),
      |tgt AS (SELECT c.event_type, c.n,
      |    least(c.n, CAST(floor(CAST(t.k AS DOUBLE)
      |      * CAST(CAST(floor(pow(c.n, 0.5) * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
      |      / CAST(t.wq_sum AS DOUBLE) + 0.5) AS BIGINT)) AS t
      |  FROM cnt c CROSS JOIN tot t),
      |thr AS (SELECT event_type,
      |    CAST(floor(281474976710656.0
      |      * CAST(floor(1000000000.0 * CAST(t AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS DOUBLE)
      |      / 1000000000.0) AS BIGINT) AS thr
      |  FROM tgt)
      |SELECT e.event_id, e.event_type
      |FROM events e JOIN thr USING (event_type)
      |WHERE CAST('0x' || substr(md5(e.event_id || ':s0'), 1, 12) AS BIGINT) < thr.thr
      |ORDER BY e.event_id""".stripMargin

  /** sample_quality_weighted: per-row acceptance with probability equal
    * to the document's OWN quality score
    * ([[graft.operators.Sampling.weightedSample]] over
    * `TextOps.qualityScore`) — the soft quality filter (high-quality
    * docs kept almost surely, middling ones proportionally) that
    * replaces a hard quality threshold in modern curation recipes.
    * Fully deterministic: the transcendental-free r4-grid score and the
    * exact-integer 48-bit md5 threshold are both recomputed verbatim by
    * the oracle. Plan: one narrow filter fused into the scan — zero
    * shuffle bar the gate ORDER BY. */
  val sampleQualityWeighted: Q = (s, dir) =>
    Sampling.weightedSample(
      Tables.documents(s, dir).select("doc_id", "text", "source"),
      col("doc_id"), TextOps.qualityScore(col("text")))
      .select("doc_id", "source").orderBy("doc_id")

  val sampleQualityWeightedSql =
    """WITH t AS (SELECT doc_id, source,
      |    CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
      |    CAST(length(text) AS DOUBLE) AS n_chars FROM documents),
      |q AS (SELECT doc_id, source,
      |    floor(((n_tokens / (n_tokens + 50.0)) *
      |      (1.0 - abs((n_chars - (n_tokens - 1)) / n_tokens - 6.0)
      |           / (abs((n_chars - (n_tokens - 1)) / n_tokens - 6.0) + 10.0))) * 10000 + 0.5) / 10000 AS w
      |  FROM t)
      |SELECT doc_id, source FROM q
      |WHERE CAST('0x' || substr(md5(doc_id || ':s0'), 1, 12) AS BIGINT)
      |  < (CAST(floor(w * 10000 + 0.5) AS BIGINT) * 281474976710656) // 10000
      |ORDER BY doc_id""".stripMargin

  val sampleHashSql =
    """SELECT doc_id, lang FROM documents
      |WHERE md5(doc_id || ':s0') < '19999999999999999999999999999999'
      |ORDER BY doc_id""".stripMargin

  /** split_assign: 80/10/10 train/val/test assignment by key hash —
    * the same key lands in the same split in every table and engine. */
  val splitAssign: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Sampling.splitColumn(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .orderBy("doc_id")

  val splitAssignSql =
    """SELECT doc_id,
      |  CASE WHEN md5(doc_id || ':s0') < 'cccccccccccccccccccccccccccccccc' THEN 'train'
      |       WHEN md5(doc_id || ':s0') < 'e6666666666666666666666666666666' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** sample_reservoir_weighted: weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis 2006, "Weighted random sampling with a
    * reservoir"): each doc draws u from its 48-bit md5 coordinate and
    * ranks by key = ln(u)/w (the monotone log form of u^(1/w)); the
    * top-k by key hold the exact-k weighted sample — here k=100
    * weighted by `n_chars`, so long docs are proportionally likelier
    * but the draw is exact-size, unlike `sample_quality_weighted`'s
    * Bernoulli coin. The distributed shape IS the reservoir algorithm:
    * per-partition top-k partials merged once (TakeOrderedAndProject —
    * no global sort, no single-task window).
    *
    * Determinism: u = (h48+1)/2⁴⁸ from md5 (identical both engines,
    * never 0); the key is quantized ONCE to 10⁸ micro-units (the ln-ulp
    * grid contract of `text_pmi_bigrams`); ties at equal key_micro
    * break by doc_id. Output carries the rank so the selection order is
    * part of the gated data. */
  val sampleReservoirWeighted: Q = (s, dir) => {
    val h = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":wr"))), 1, 12), 16, 10).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(281474976710656.0)
    val keyMicro = floor(log(u) / col("n_chars").cast("double")
      * lit(100000000L) + lit(0.5)).cast("long")
    val scored = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars").as("w"), keyMicro.as("key_micro"))
    graft.operators.Relational.topK(scored, 100,
        col("key_micro").desc, col("doc_id").asc)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("key_micro").desc, col("doc_id").asc)))
      .select(col("rank"), col("doc_id"), col("w"), col("key_micro"))
  }

  val sampleReservoirWeightedSql: String =
    """WITH s AS (SELECT doc_id, n_chars AS w,
      |    CAST(floor(ln((CAST('0x' || substr(md5(doc_id || ':wr'), 1, 12)
      |        AS BIGINT) + 1) / 281474976710656.0)
      |      / CAST(n_chars AS DOUBLE) * 100000000 + 0.5) AS BIGINT)
      |      AS key_micro
      |  FROM documents)
      |SELECT CAST(row_number() OVER
      |    (ORDER BY key_micro DESC, doc_id) AS INT) AS rank,
      |  doc_id, w, key_micro
      |FROM s ORDER BY key_micro DESC, doc_id LIMIT 100""".stripMargin

  /** dq_split_leakage: train/val/test LEAKAGE audit over the
    * `split_assign` splits — for every 8-token shingle, which splits it
    * appears in; the report counts shingles shared across each split
    * pair. Exact duplicates are the loud case, but the near-dup
    * families this catches are the one that silently inflates eval
    * scores: a test doc 98%-similar to a train doc shares almost every
    * 8-gram. All counts integer (one row, three leak counters + the
    * distinct-shingle total).
    *
    * Scale shape: shingling is a narrow HOF off the scan; the (split,
    * shingle) distinct and the per-shingle flag fold are ONE map-side-
    * combinable aggregate chain keyed on the shingle; the final fold is
    * a constant-size single-row aggregate. Nothing wider than
    * (shingle → 3 bools) ever shuffles. The <8-token guard emits an
    * EMPTY array explicitly — `sequence(1, size−7)` on a short doc
    * would generate a DESCENDING range (the spanDedup hazard, ADVICE
    * r8). */
  def splitLeakage(docs: DataFrame, split: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column, shingleSize: Int = 8): DataFrame =
    docs
      // the per-row distinct-hash-set kernel (dedup_jaccard's posting
      // recipe): 8-byte hashes cross the exchange instead of ~50-byte
      // gram strings, the set-dedup happens inside the row, and the
      // kernel's own empty-text/short-doc guard covers the
      // descending-sequence hazard. Hash-distinct ≡ text-distinct modulo
      // 64-bit collisions — the dedup_jaccard contract, oracle-mirrored
      // on gram text.
      .select(split.as("split"),
        explode(graft.plans.TextExpressions.shingleHashSet(text, shingleSize))
          .as("g"))
      .distinct()
      .groupBy("g").agg(
        bool_or(col("split") === "train").as("tr"),
        bool_or(col("split") === "val").as("va"),
        bool_or(col("split") === "test").as("te"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("tr") && col("va"), 1L).otherwise(0L)).as("n_train_val"),
        sum(when(col("tr") && col("te"), 1L).otherwise(0L)).as("n_train_test"),
        sum(when(col("va") && col("te"), 1L).otherwise(0L)).as("n_val_test"))

  /** curate_gopher_rules: the Gopher repetition-free quality-rule set
    * (Rae et al. 2021 §A1.1.1, thresholds recalibrated to the fixture's
    * word-soup shape so every rule is non-vacuous): per doc the three
    * rule verdicts and the conjunction —
    * R1 word count ∈ [20, 100 000]; R2 mean word length ∈ [3.5, 5.0];
    * R3 ≥ 1 of the probe stop words {the, a, of, to} present. The
    * named rule-attribution filter beside `text_quality`'s scalar score
    * and `pipeline_quality_filter`'s gate accounting.
    *
    * Exactness: ALL integers and booleans — the mean-length bounds are
    * cross-multiplied (2·chars ≥ 7·n, chars ≤ 5·n), so no division
    * exists anywhere; stop-word presence is an explicit sum of four
    * contains flags (no reliance on either engine's list-intersect
    * dedup semantics). Scale: one narrow projection fused into the
    * scan — zero shuffle before the output sort. */
  val curateGopherRules: Q = (s, dir) => {
    val w = TextOps.tokens(col("text"))
    val n = size(w).cast("long")
    val chars = aggregate(w, lit(0L), (acc, x) => acc + length(x).cast("long"))
    val nStop = Seq("the", "a", "of", "to")
      .map(sw => array_contains(w, sw).cast("long")).reduce(_ + _)
    Tables.documents(s, dir)
      .select(col("doc_id"), n.as("n_words"), chars.as("sum_wlen"),
        nStop.as("n_stop"))
      .select(col("doc_id"), col("n_words"), col("sum_wlen"), col("n_stop"),
        (col("n_words") >= 20L && col("n_words") <= 100000L).as("r1_count"),
        (col("sum_wlen") * 2 >= col("n_words") * 7 &&
          col("sum_wlen") <= col("n_words") * 5).as("r2_wlen"),
        (col("n_stop") >= 1L).as("r3_stop"))
      .withColumn("kept", col("r1_count") && col("r2_wlen") && col("r3_stop"))
      .orderBy("doc_id")
  }

  val curateGopherRulesSql: String =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w
      |  FROM documents),
      |m AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
      |      AS sum_wlen,
      |    CAST(CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END
      |      + CASE WHEN list_contains(w, 'a') THEN 1 ELSE 0 END
      |      + CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END
      |      + CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END AS BIGINT)
      |      AS n_stop
      |  FROM t)
      |SELECT doc_id, n_words, sum_wlen, n_stop,
      |  (n_words >= 20 AND n_words <= 100000) AS r1_count,
      |  (sum_wlen * 2 >= n_words * 7 AND sum_wlen <= n_words * 5) AS r2_wlen,
      |  (n_stop >= 1) AS r3_stop,
      |  ((n_words >= 20 AND n_words <= 100000)
      |    AND (sum_wlen * 2 >= n_words * 7 AND sum_wlen <= n_words * 5)
      |    AND n_stop >= 1) AS kept
      |FROM m ORDER BY doc_id""".stripMargin

  /** curate_host_cap: per-HOST document cap
    * ([[graft.operators.Sampling.hostCap]], round 11) — keep at most 5
    * docs per host, longest first (n_chars DESC, doc_id tie-break): the
    * crawl-politeness / SEO-spam guard (C4/RefinedWeb/Dolma all cap
    * per-domain mass — one link-farm must not own the corpus). The
    * fixture's hosts are crawl-shaped: ~30% of docs pile onto 23
    * crowded "link-farm" hosts (over the cap — the ranked path; 23
    * farms so the windowed partitions scale with the core count rather
    * than pinning the probe at 3 serial tasks), the rest sit on
    * singleton hosts (under it — the wholesale pass path). BOTH paths
    * are live in the gate at every SF (SamplingSpec asserts it).
    * Oracle: a plain per-host row_number replay (the two-path split is
    * an optimization, not a semantics change). */
  val curateHostCap: Q = (s, dir) => {
    def host = concat(lit("h"),
      when(pmod(col("doc_id"), lit(10L)) < 3, pmod(col("doc_id"), lit(23L)))
        .otherwise(col("doc_id") + lit(100L)), lit(".example.org"))
    Sampling.hostCap(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
        host, Seq(col("n_chars").desc, col("doc_id").asc), k = 5)
      .select(col("doc_id"), host.as("host"))
      .orderBy("doc_id")
  }

  val curateHostCapSql: String =
    """WITH h AS (SELECT doc_id, n_chars,
      |    'h' || CAST(CASE WHEN doc_id % 10 < 3 THEN doc_id % 23
      |                     ELSE doc_id + 100 END AS VARCHAR) || '.example.org' AS host
      |  FROM documents),
      |r AS (SELECT doc_id, host,
      |    row_number() OVER (PARTITION BY host ORDER BY n_chars DESC, doc_id) AS rn
      |  FROM h)
      |SELECT doc_id, host FROM r WHERE rn <= 5 ORDER BY doc_id""".stripMargin

  val dqSplitLeakage: Q = (s, dir) =>
    splitLeakage(Tables.documents(s, dir),
      Sampling.splitColumn(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)),
      col("text"))

  val dqSplitLeakageSql: String =
    """WITH s AS (SELECT string_split(lower(text), ' ') AS t,
      |    CASE WHEN md5(doc_id || ':s0') < 'cccccccccccccccccccccccccccccccc'
      |        THEN 'train'
      |      WHEN md5(doc_id || ':s0') < 'e6666666666666666666666666666666'
      |        THEN 'val'
      |      ELSE 'test' END AS split
      |  FROM documents),
      |sh AS (SELECT DISTINCT split,
      |    unnest(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
      |      i -> array_to_string(t[i:i+7], ' '))) AS g
      |  FROM s),
      |f AS (SELECT g, bool_or(split = 'train') AS tr,
      |    bool_or(split = 'val') AS va, bool_or(split = 'test') AS te
      |  FROM sh GROUP BY g)
      |SELECT count(*) AS n_shingles,
      |  CAST(sum(CASE WHEN tr AND va THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_train_val,
      |  CAST(sum(CASE WHEN tr AND te THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_train_test,
      |  CAST(sum(CASE WHEN va AND te THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_val_test
      |FROM f""".stripMargin

  /** sample_stratified: 20% within each language independently. */
  val sampleStratified: Q = (s, dir) =>
    Sampling.stratifiedSample(Tables.documents(s, dir), col("doc_id"), col("lang"), 0.2)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .orderBy("lang")

  val sampleStratifiedSql =
    """SELECT lang, count(*) AS n FROM documents
      |WHERE md5(lang || '|' || doc_id || ':s0') < '33333333333333333333333333333333'
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** sample_stratified_exact: EXACTLY k=50 docs per language by
    * hash-rank — the exact-size sibling of `sample_stratified`'s
    * Bernoulli coin (binomial ±√n wobble per stratum vs a guaranteed
    * quota), the draw an evaluation-set builder actually wants. Each
    * stratum ranks its docs by the 48-bit md5 coordinate (doc_id
    * tie-break — the `sample_temperature_rank` exact-cut recipe) and keeps
    * rank ≤ k; strata smaller than k are kept whole. One stratum-keyed
    * exchange for the rank window; no global sort, no driver state. */
  val sampleStratifiedExact: Q = (s, dir) => {
    val u = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":se"))), 1, 12), 16, 10).cast("long")
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("u").asc, col("doc_id").asc)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), u.as("u"))
      .withColumn("rk", row_number().over(W))
      .filter(col("rk") <= 50)
      .select(col("lang"), col("doc_id"), col("rk"))
      .orderBy("lang", "rk")
  }

  val sampleStratifiedExactSql: String =
    """WITH s AS (SELECT doc_id, lang,
      |    CAST('0x' || substr(md5(doc_id || ':se'), 1, 12) AS BIGINT) AS u
      |  FROM documents)
      |SELECT lang, doc_id, CAST(rk AS INT) AS rk FROM (
      |  SELECT lang, doc_id,
      |    row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rk
      |  FROM s) WHERE rk <= 50
      |ORDER BY lang, rk""".stripMargin

  /** pipeline_rag_prep: the LAKE-TO-SHARDS flagship (round 10) — the
    * full ingest-to-training-layout path in one gated row, composing the
    * snapshot surface with the curation/packing ops: (1) the corpus
    * lands as TWO snapshot commits and is read PINNED at the second
    * version ([[graft.sources.Snapshots]] — the ingest boundary a 100 TB
    * deployment actually has); (2) per-row quality filter on the
    * r4-gridded rational score (threshold on the ROUNDED value, §7.4);
    * (3) exact dedup keeps each text's min doc_id (digest-only
    * shuffle); (4) the survivor stream packs into 4096-token chunks via
    * the scalable two-phase prefix sum; (5) shard assignment by the
    * reproducible 48-bit md5 shuffle. Every stage is an
    * already-gated kernel; the composition is what a RAG/pretrain prep
    * job runs nightly off the lake's CDC. */
  val pipelineRagPrep: Q = (s, dir) => {
    import graft.sources.Snapshots
    val key = f"${dir.hashCode & 0x7fffffff}%08x"
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_roundtrip/$key/docs_rag"
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    val d = Tables.documents(s, dir)
    Snapshots.commitAppend(s, root, d.filter(col("doc_id") % 2 === 0).repartition(2))
    val v = Snapshots.commitAppend(s, root, d.filter(col("doc_id") % 2 =!= 0).repartition(2))
    val corpus = Snapshots.readSnapshot(s, root, v)
    val q = corpus.select(col("doc_id"), col("text"),
        r4(TextOps.qualityScore(col("text"))).as("q"))
      .filter(col("q") >= 0.35)
    val keep = Dedup.exact(q, col("text"), col("doc_id"))
      .select(col("keep_id").as("doc_id"))
    // clean feeds BOTH the chunk packer and the shard assigner — cut its
    // two narrow columns once (round 15) so the quality+dedup+tokenize
    // chain runs once, not per consumer
    val clean = graft.operators.Checkpointing.cut(q.join(keep, "doc_id")
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("n_tokens")))
    val chunked = Packing.packChunks(clean, col("doc_id"), col("n_tokens"), 4096L)
      .withColumnRenamed("offset", "tok_offset")
    val sharded = Packing.shardAssign(clean, col("doc_id"), 100L)
    chunked.join(sharded.select("doc_id", "shard_id"), "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("tok_offset"),
        col("chunk_id"), col("shard_id"))
      .orderBy("doc_id")
  }

  val pipelineRagPrepSql =
    """WITH t AS (SELECT doc_id, text,
      |    CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
      |    CAST(length(text) AS DOUBLE) AS n_chars FROM documents),
      |q AS (SELECT doc_id, text, CAST(n_tokens AS BIGINT) AS n_tokens,
      |    floor(((n_tokens / (n_tokens + 50.0)) *
      |      (1.0 - abs((n_chars - (n_tokens - 1)) / n_tokens - 6.0)
      |           / (abs((n_chars - (n_tokens - 1)) / n_tokens - 6.0) + 10.0))) * 10000 + 0.5) / 10000 AS q
      |  FROM t),
      |f AS (SELECT doc_id, text, n_tokens FROM q WHERE q >= 0.35),
      |keep AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY md5(lower(trim(text)))),
      |surv AS (SELECT f.doc_id, f.n_tokens FROM f JOIN keep USING (doc_id)),
      |o AS (SELECT doc_id, n_tokens,
      |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
      |  FROM surv),
      |u AS (SELECT doc_id,
      |    CAST('0x' || substr(md5(doc_id || ':shard'), 1, 12) AS BIGINT) AS u FROM surv),
      |r AS (SELECT doc_id,
      |    CAST(row_number() OVER (ORDER BY u, doc_id) AS BIGINT) AS rank FROM u)
      |SELECT o.doc_id, o.n_tokens, o.tok_offset,
      |  CAST(floor(o.tok_offset / 4096) AS BIGINT) AS chunk_id,
      |  CAST(floor((r.rank - 1) / 100) AS BIGINT) AS shard_id
      |FROM o JOIN r ON r.doc_id = o.doc_id
      |ORDER BY o.doc_id""".stripMargin

  /** eval_pack_efficiency: packing-quality audit over `pack_chunks`'
    * 4096-token chunks (round 10) — per chunk: doc count and token fill
    * (a chunk's LAST doc may spill past the boundary, so fill bands
    * above 10/10 measure straddle overhead, the thing a sequence-packing
    * deployment actually tunes); rolled into a fill-band histogram.
    * Pure integers end to end: the band is BIGINT floor-division
    * `(fill·10) div 4096` — no doubles anywhere. */
  val evalPackEfficiency: Q = (s, dir) =>
    Packing.packChunks(
        Tables.documents(s, dir).select(col("doc_id"),
          size(TextOps.tokens(col("text"))).as("n_tokens")),
        col("doc_id"), col("n_tokens"), 4096L)
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("fill"))
      .groupBy(expr("CAST((fill * 10) DIV 4096 AS BIGINT)").as("fill_band"))
      .agg(count(lit(1)).as("n_chunks"), sum("n_docs").as("n_docs"),
        sum("fill").as("sum_tokens"))
      .orderBy("fill_band")

  val evalPackEfficiencySql =
    """WITH t AS (SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |o AS (SELECT doc_id, n_tokens,
      |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
      |  FROM t),
      |c AS (SELECT CAST(floor(tok_offset / 4096) AS BIGINT) AS chunk_id,
      |    count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS fill
      |  FROM o GROUP BY 1)
      |SELECT (fill * 10) // 4096 AS fill_band, count(*) AS n_chunks,
      |  CAST(sum(n_docs) AS BIGINT) AS n_docs, CAST(sum(fill) AS BIGINT) AS sum_tokens
      |FROM c GROUP BY 1 ORDER BY fill_band""".stripMargin

  /** pack_chunks: concat-and-chunk sequence packing — global token-stream
    * offset + 4096-token chunk id per doc, via the scalable two-phase
    * prefix sum (oracle = DuckDB's naive global SUM() OVER). */
  val packChunks: Q = (s, dir) =>
    Packing.packChunks(
        Tables.documents(s, dir).select(col("doc_id"),
          size(TextOps.tokens(col("text"))).as("n_tokens")),
        col("doc_id"), col("n_tokens"), 4096L)
      .withColumnRenamed("offset", "tok_offset")
      .orderBy("doc_id")

  val packChunksSql =
    """WITH t AS (SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |o AS (SELECT doc_id, n_tokens,
      |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
      |  FROM t)
      |SELECT doc_id, n_tokens, tok_offset,
      |  CAST(floor(tok_offset / 4096) AS BIGINT) AS chunk_id
      |FROM o ORDER BY doc_id""".stripMargin

  /** pack_shards: deterministic shuffled sharding — the layout step that
    * turns a curated corpus into equal-size training shard files. Docs
    * are ranked by a reproducible 48-bit md5 coordinate (a global
    * pseudo-random shuffle both engines can replay) and cut into
    * 100-doc shards. Rank is the scalable two-phase prefix form
    * ([[Packing.shardAssign]]) — range-bucketed windows, never one
    * global window task; DuckDB recomputes the identical ranking with
    * a single ROW_NUMBER. */
  val packShards: Q = (s, dir) =>
    Packing.shardAssign(Tables.documents(s, dir), col("doc_id"), 100L)
      .orderBy("doc_id")

  val packShardsSql =
    """WITH u AS (SELECT doc_id,
      |    CAST('0x' || substr(md5(doc_id || ':shard'), 1, 12) AS BIGINT) AS u
      |  FROM documents),
      |r AS (SELECT doc_id,
      |    CAST(row_number() OVER (ORDER BY u, doc_id) AS BIGINT) AS rank
      |  FROM u)
      |SELECT doc_id, rank, CAST(floor((rank - 1) / 100) AS BIGINT) AS shard_id
      |FROM r ORDER BY doc_id""".stripMargin

  /** curriculum_bins: curriculum-learning difficulty bins — per-source
    * quality deciles (NTILE over the quality order) with per-bin
    * accounting, the standard prelude to quality-ordered training
    * schedules. Determinism across engines: the order key is the
    * r4-QUANTIZED quality (both engines agree on the grid value —
    * ordering by the raw double would let a sub-grid disagreement flip
    * a bin) with doc_id tie-break, and the per-bin mean is computed on
    * integer micro-units (exact long sum, one final division) so no
    * float accumulation order can flip the rounded output. One window
    * + one aggregate, both partitioned by source — the 100 TB shape. */
  val curriculumBins: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        r4(TextOps.qualityScore(col("text"))).as("q"))
      // floor(+0.5), not a bare cast: q is an r4 grid value whose ×10⁴ can
      // land a hair under the integer (0.1234 → 1233.999…), and Spark's
      // long cast truncates where DuckDB's rounds — half-up on both sides
      .withColumn("__qi", floor(col("q") * 10000 + 0.5).cast("long"))
    val w = Window.partitionBy("source").orderBy(col("q").asc, col("doc_id").asc)
    docs.withColumn("bin", ntile(10).over(w))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"),
        r4(sum(col("__qi")) / (count(lit(1)) * 10000.0)).as("avg_quality"),
        min("q").as("min_quality"),
        max("q").as("max_quality"))
      .orderBy("source", "bin")
  }

  val curriculumBinsSql =
    """WITH q AS (
      |  SELECT source, doc_id,
      |    floor(((n_tokens / (n_tokens + 50.0)) *
      |      (1.0 - abs((n_chars - (n_tokens - 1)) / n_tokens - 6.0)
      |           / (abs((n_chars - (n_tokens - 1)) / n_tokens - 6.0) + 10.0))) * 10000 + 0.5) / 10000 AS q
      |  FROM (SELECT source, doc_id, CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
      |          CAST(length(text) AS DOUBLE) AS n_chars FROM documents) t),
      |b AS (SELECT source, doc_id, q, CAST(floor(q * 10000 + 0.5) AS BIGINT) AS qi,
      |    ntile(10) OVER (PARTITION BY source ORDER BY q, doc_id) AS bin
      |  FROM q)
      |SELECT source, bin, count(*) AS n_docs,
      |  floor((CAST(sum(qi) AS DOUBLE) / (count(*) * 10000.0)) * 10000 + 0.5) / 10000 AS avg_quality,
      |  min(q) AS min_quality, max(q) AS max_quality
      |FROM b GROUP BY source, bin ORDER BY source, bin""".stripMargin

  /** curate_source_hhi: source-concentration audit per language — the
    * Herfindahl–Hirschman index of the source distribution,
    * HHI = Σ_s (c_s/T)², plus its inverse (the "effective source
    * count"). A corpus slice dominated by one crawl source memorizes
    * that source's quirks; HHI → 1 flags it, HHI → 1/n_sources is
    * healthy. Exactness: hhi_num = Σ c_s² and T² are pure BIGINT (c ≤
    * 3·10⁹ docs per (lang, source) before c² overflows — document-count
    * scale, not token scale); hhi and eff_sources are each one IEEE
    * division on the 1e-8 grid.
    *
    * Scale shape: one map-side-combined (lang, source) count shuffle,
    * then an O(langs × sources) per-lang aggregate — nothing else
    * touches the corpus. */
  val curateSourceHhi: Q = (s, dir) =>
    Tables.documents(s, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("c"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_sources"),
        sum(col("c")).as("n_docs"),
        sum(col("c") * col("c")).as("hhi_num"))
      .select(col("lang"), col("n_sources"), col("n_docs"), col("hhi_num"),
        graft.functions.Num.r8(col("hhi_num").cast("double")
          / (col("n_docs") * col("n_docs")).cast("double")).as("hhi"),
        graft.functions.Num.r8((col("n_docs") * col("n_docs")).cast("double")
          / col("hhi_num").cast("double")).as("eff_sources"))
      .orderBy("lang")

  val curateSourceHhiSql =
    """WITH c AS (
      |  SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2),
      |a AS (
      |  SELECT lang, count(*) AS n_sources, CAST(sum(c) AS BIGINT) AS n_docs,
      |    CAST(sum(c * c) AS BIGINT) AS hhi_num
      |  FROM c GROUP BY 1)
      |SELECT lang, n_sources, n_docs, hhi_num,
      |  floor((CAST(hhi_num AS DOUBLE) / CAST(n_docs * n_docs AS DOUBLE))
      |    * 100000000 + 0.5) / 100000000 AS hhi,
      |  floor((CAST(n_docs * n_docs AS DOUBLE) / CAST(hhi_num AS DOUBLE))
      |    * 100000000 + 0.5) / 100000000 AS eff_sources
      |FROM a ORDER BY lang""".stripMargin

  /** curate_source_entropy: Shannon diversity of the per-language source
    * mix — the information-theoretic sibling of `curate_source_hhi`:
    * H = ln N − (Σ_s c_s·ln c_s)/N and perplexity e^H ("how many equally-
    * weighted sources is this mix worth"), the diversity score data-mix
    * papers report where HHI is the concentration alarm.
    *
    * Exactness: ln c is quantized ONCE per count to 10⁸ micro-units (the
    * adamic_adar libm recipe), so Σ c·lnμ(c) is merge-order-proof
    * BIGINT and H = (lnμ(N)·N − Σ c·lnμ(c))/(N·10⁸) is ONE IEEE
    * division of exact-in-double longs on the 1e-8 grid; e^H is one
    * libm exp OF THE GRIDDED H (both engines feed exp the identical
    * double; exp's sub-ulp wobble is ~10⁻¹⁴ here, absorbed by the
    * second r8).
    *
    * Scale shape = `curate_source_hhi`: one map-side-combined
    * (lang, source) count shuffle, then O(langs × sources) arithmetic —
    * nothing else touches the corpus. */
  val curateSourceEntropy: Q = (s, dir) =>
    Tables.documents(s, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("c"))
      .select(col("lang"), col("c"),
        floor(log(col("c").cast("double")) * 100000000L + 0.5)
          .cast("long").as("lnc"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_sources"),
        sum(col("c")).as("n_docs"),
        sum(col("c") * col("lnc")).as("h_term"))
      .select(col("lang"), col("n_sources"), col("n_docs"),
        (floor(log(col("n_docs").cast("double")) * 100000000L + 0.5)
          .cast("long") * col("n_docs") - col("h_term")).as("h_num"))
      .select(col("lang"), col("n_sources"), col("n_docs"), col("h_num"),
        graft.functions.Num.r8(col("h_num").cast("double")
          / (col("n_docs").cast("double") * 100000000.0)).as("entropy"))
      .withColumn("perplexity", graft.functions.Num.r8(exp(col("entropy"))))
      .orderBy("lang")

  val curateSourceEntropySql =
    """WITH c AS (
      |  SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2),
      |q AS (SELECT lang, c,
      |    CAST(floor(ln(CAST(c AS DOUBLE)) * 100000000 + 0.5) AS BIGINT) AS lnc
      |  FROM c),
      |a AS (
      |  SELECT lang, count(*) AS n_sources, CAST(sum(c) AS BIGINT) AS n_docs,
      |    CAST(sum(c * lnc) AS BIGINT) AS h_term
      |  FROM q GROUP BY 1),
      |h AS (
      |  SELECT lang, n_sources, n_docs,
      |    CAST(CAST(floor(ln(CAST(n_docs AS DOUBLE)) * 100000000 + 0.5)
      |      AS BIGINT) * n_docs - h_term AS BIGINT) AS h_num
      |  FROM a),
      |e AS (
      |  SELECT lang, n_sources, n_docs, h_num,
      |    floor(CAST(h_num AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 100000000)
      |      * 100000000 + 0.5) / 100000000 AS entropy
      |  FROM h)
      |SELECT lang, n_sources, n_docs, h_num, entropy,
      |  floor(exp(entropy) * 100000000 + 0.5) / 100000000 AS perplexity
      |FROM e ORDER BY lang""".stripMargin

  /** curate_quality_ensemble: per-source Borda-rank ensemble of three
    * quality signals — token count, type-token ratio, mean word length —
    * the final "one number to sort by" a curation pipeline feeds its
    * keep-fraction, rank-aggregated so no single signal's scale
    * dominates (and no cross-signal calibration knob exists to drift).
    *
    * Exactness: every signal is an integer or a 10⁶-quantized integer
    * division (both engines' `div`), so the per-source (signal DESC,
    * doc_id) ranks and their Borda sum are pure integers.
    *
    * Scale shape: signals are narrow HOFs fused into the scan; ranking
    * is WITHIN SOURCE — keyed windows, never a global rank; all three
    * rank windows ride ONE source-keyed exchange (three in-partition
    * sorts, the honest cost of three orderings). */
  val curateQualityEnsemble: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val sig = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), TextOps.tokens(col("text")).as("ts"))
      .select(col("doc_id"), col("source"),
        size(col("ts")).cast("long").as("n_tokens"),
        size(array_distinct(col("ts"))).cast("long").as("n_distinct"),
        aggregate(col("ts"), lit(0L), (acc, x) => acc + length(x)).as("sum_len"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr("(n_distinct * 1000000) div n_tokens").as("ttr_micro"),
        expr("(sum_len * 1000000) div n_tokens").as("mwl_micro"))
    def w(c: org.apache.spark.sql.Column) = Window.partitionBy("source")
      .orderBy(c.desc, col("doc_id").asc)
    sig
      .withColumn("r1", row_number().over(w(col("n_tokens"))))
      .withColumn("r2", row_number().over(w(col("ttr_micro"))))
      .withColumn("r3", row_number().over(w(col("mwl_micro"))))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("ttr_micro"), col("mwl_micro"), col("r1"), col("r2"), col("r3"),
        (col("r1").cast("long") + col("r2") + col("r3")).as("borda"))
      .orderBy("doc_id")
  }

  val curateQualityEnsembleSql: String =
    """WITH t AS (SELECT doc_id, source, string_split(lower(text), ' ') AS ts
      |  FROM documents),
      |s AS (SELECT doc_id, source, CAST(len(ts) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(ts)) AS BIGINT) AS n_distinct,
      |    CAST(list_sum(list_transform(ts, x -> len(x))) AS BIGINT) AS sum_len
      |  FROM t),
      |q AS (SELECT doc_id, source, n_tokens,
      |    CAST((n_distinct * 1000000) // n_tokens AS BIGINT) AS ttr_micro,
      |    CAST((sum_len * 1000000) // n_tokens AS BIGINT) AS mwl_micro
      |  FROM s),
      |r AS (SELECT doc_id, source, n_tokens, ttr_micro, mwl_micro,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY n_tokens DESC, doc_id) AS INT) AS r1,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY ttr_micro DESC, doc_id) AS INT) AS r2,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY mwl_micro DESC, doc_id) AS INT) AS r3
      |  FROM q)
      |SELECT doc_id, source, n_tokens, ttr_micro, mwl_micro, r1, r2, r3,
      |  CAST(r1 + r2 + r3 AS BIGINT) AS borda
      |FROM r ORDER BY doc_id""".stripMargin

  /** curate_dsir: DSIR-style importance weighting (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling") —
    * per doc the log-likelihood ratio of a TARGET token distribution
    * (here the `lang='en'` slice) against the RAW corpus distribution,
    * over hashed unigram features: score(d) = Σ_{w∈d} ln(p̂_t(b(w)) /
    * p̂_r(b(w))), with b = md5-bucket into 1024 features and Laplace
    * (+1) smoothing on both sides. High scores mark crawl docs that
    * "look like" the target corpus — THE data-selection signal for
    * pretraining mixes.
    *
    * Exactness: bucket counts are integers from one map-side-combined
    * aggregate; each of the 1024 per-bucket log-ratios is quantized
    * ONCE to 10⁸ micro-units (the `dq_drift_psi` libm recipe — ln on
    * bit-identical double ratios), so per-doc scores are
    * merge-order-proof BIGINT sums of those units; the reported double
    * is one exact-token division. Scale shape: tokenize narrow →
    * bucket-count aggregate (1024-row output) → totals on a 1-row
    * broadcast → the 1024-row weight table broadcast back onto the
    * token stream → ONE map-side-combined per-doc sum. Two data-wide
    * exchanges total, both combiner-friendly; the corpus is never
    * joined wide. */
  val curateDsir: Q = (s, dir) =>
    graft.operators.Dsir.scores(Tables.documents(s, dir), col("doc_id"),
        col("lang") === "en", TextOps.tokens(col("text")), buckets = 1024)
      .orderBy("doc_id")

  val curateDsirSql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang = 'en' AS tgt,
      |    CAST('0x' || substr(md5(w), 1, 6) AS BIGINT) % 1024 AS bkt
      |  FROM (SELECT doc_id, lang,
      |      unnest(string_split(lower(text), ' ')) AS w FROM documents)),
      |cnt AS (SELECT bkt, count(*) AS c_r,
      |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS c_t
      |  FROM tok GROUP BY bkt),
      |tot AS (SELECT CAST(sum(c_r) AS BIGINT) AS r, CAST(sum(c_t) AS BIGINT) AS t
      |  FROM cnt),
      |wt AS (SELECT bkt,
      |    CAST(floor(ln(
      |      (CAST(c_t + 1 AS DOUBLE) / CAST(t.t + 1024 AS DOUBLE))
      |      / (CAST(c_r + 1 AS DOUBLE) / CAST(t.r + 1024 AS DOUBLE)))
      |      * 100000000 + 0.5) AS BIGINT) AS wq
      |  FROM cnt CROSS JOIN tot t)
      |SELECT b.doc_id, count(*) AS n_tokens,
      |  CAST(sum(w.wq) AS BIGINT) AS score_micro,
      |  CAST(sum(w.wq) AS DOUBLE) / 100000000.0 AS score
      |FROM tok b JOIN wt w USING (bkt)
      |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin

  /** pipeline_curate: the end-to-end curation pipeline as ONE declarative
    * plan — quality gate → exact dedup (keep min doc_id) → deterministic
    * train/val/test split → per-split summary. Every stage is an operator
    * proven above; composing them lets Catalyst fuse the narrow stages
    * (quality score, split hash) into single projections around the one
    * dedup shuffle. */
  val pipelineCurate: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val quality = docs
      .withColumn("quality", TextOps.qualityScore(col("text")))
      .filter(col("quality") >= 0.5)
    val keep = Dedup.exact(quality, col("text"), col("doc_id"))
      .select(col("keep_id").as("doc_id"))
    quality.join(keep, "doc_id")
      .select(col("doc_id"), col("quality"),
        Sampling.splitColumn(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), r4(avg("quality")).as("avg_quality"))
      .orderBy("split")
  }

  val pipelineCurateSql =
    """WITH q AS (
      |  SELECT doc_id, text,
      |    floor(((n_tokens / (n_tokens + 50.0)) *
      |      (1.0 - abs((n_chars - (n_tokens - 1)) / n_tokens - 6.0)
      |           / (abs((n_chars - (n_tokens - 1)) / n_tokens - 6.0) + 10.0))) * 10000 + 0.5) / 10000 AS quality
      |  FROM (SELECT doc_id, text, CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
      |          CAST(length(text) AS DOUBLE) AS n_chars FROM documents) t),
      |qf AS (SELECT * FROM q WHERE quality >= 0.5),
      |keep AS (SELECT min(doc_id) AS doc_id FROM qf GROUP BY md5(lower(trim(text)))),
      |labeled AS (
      |  SELECT qf.doc_id, qf.quality,
      |    CASE WHEN md5(qf.doc_id || ':s0') < 'cccccccccccccccccccccccccccccccc' THEN 'train'
      |         WHEN md5(qf.doc_id || ':s0') < 'e6666666666666666666666666666666' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM qf JOIN keep ON qf.doc_id = keep.doc_id)
      |SELECT split, count(*) AS n_docs,
      |  floor((avg(quality)) * 10000 + 0.5) / 10000 AS avg_quality
      |FROM labeled GROUP BY split ORDER BY split""".stripMargin

  /** pipeline_pretrain: the full pretraining-corpus prep, one declarative
    * plan — quality filter → benchmark DEcontamination (anti-join against
    * the broadcast eval-gram set) → exact dedup (keep min-id per digest)
    * → per-source mixture sampling → train/val/test split → per
    * (split, source) doc/token accounting. Every stage is the documented
    * 100 TB shape: narrow filters + one digest shuffle + broadcast
    * anti-join; the fact table is shuffled exactly once (dedup).
    *
    * The mixture and split hashes use DIFFERENT salts — with a shared
    * salt the two decisions correlate (a source kept at rate 0.8 would
    * land entirely in 'train'); independent decisions need independent
    * coordinates. Oracle: the same WITH-chain in DuckDB. */
  val pipelinePretrain: Q = (s, dir) => {
    import graft.operators.Contamination
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val quality = corpus.withColumn("quality", TextOps.qualityScore(col("text")))
      .filter(col("quality") >= 0.5)
    val contaminated = Contamination.flagged(quality, bench, col("text"), col("doc_id"), n = 5)
      .select("doc_id")
    val clean = quality.join(contaminated, Seq("doc_id"), "left_anti")
    val keep = Dedup.exact(clean, col("text"), col("doc_id"))
      .select(col("keep_id").as("doc_id"))
    val deduped = clean.join(keep, "doc_id")
    val mixed = Sampling.mixtureSample(deduped, col("doc_id"), col("source"),
      Seq("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.25), default = 0.1, salt = "mix")
    mixed.select(col("source"),
        size(TextOps.tokens(col("text"))).as("n_tokens"),
        Sampling.splitColumn(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
      .orderBy("split", "source")
  }

  val pipelinePretrainSql =
    """WITH q AS (
      |  SELECT doc_id, text, source,
      |    floor(((n_tokens / (n_tokens + 50.0)) *
      |      (1.0 - abs((n_chars - (n_tokens - 1)) / n_tokens - 6.0)
      |           / (abs((n_chars - (n_tokens - 1)) / n_tokens - 6.0) + 10.0))) * 10000 + 0.5) / 10000 AS quality
      |  FROM (SELECT doc_id, text, source, CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
      |          CAST(length(text) AS DOUBLE) AS n_chars FROM documents
      |        WHERE doc_id % 97 <> 0) t),
      |qf AS (SELECT * FROM q WHERE quality >= 0.5),
      |tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |g AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 4, 0) + 1),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS sh
      |  FROM tk),
      |bench AS (SELECT DISTINCT sh FROM g WHERE doc_id % 97 = 0),
      |cont AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (sh) WHERE doc_id % 97 <> 0),
      |clean AS (SELECT * FROM qf WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
      |keep AS (SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(lower(trim(text)))),
      |ded AS (SELECT clean.* FROM clean JOIN keep USING (doc_id)),
      |mixed AS (SELECT * FROM ded WHERE md5(doc_id || ':mix') <
      |  CASE source
      |    WHEN 'src0' THEN 'cccccccccccccccccccccccccccccccc'
      |    WHEN 'src1' THEN '80000000000000000000000000000000'
      |    WHEN 'src2' THEN '40000000000000000000000000000000'
      |    ELSE '19999999999999999999999999999999' END),
      |lab AS (SELECT source, CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
      |  CASE WHEN md5(doc_id || ':s0') < 'cccccccccccccccccccccccccccccccc' THEN 'train'
      |       WHEN md5(doc_id || ':s0') < 'e6666666666666666666666666666666' THEN 'val'
      |       ELSE 'test' END AS split
      |  FROM mixed)
      |SELECT split, source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
      |FROM lab GROUP BY split, source ORDER BY split, source""".stripMargin

  /** pipeline_near_dedup: the NEAR-duplicate curation pipeline end to end
    * — MinHash signatures (per-row kernel, computed once) → LSH banding
    * candidates → signature-verify ≥ 0.8 → connected components → one
    * representative per cluster → kept/deduped summary. The LSH
    * complement of [[pipelineCurate]]'s exact dedup: every stage is the
    * documented 100 TB shape (no O(n²) anywhere). Rows-only (hash
    * family); exact-duplicate texts landing in one cluster is asserted
    * in DedupSimilaritySpec. */
  val pipelineNearDedup: Q = (s, dir) => {
    import graft.operators.Components
    val docs = Tables.documents(s, dir)
    val sigs = Dedup.minhashSignatures(docs, col("text"), col("doc_id")).localCheckpoint(true)
    val pairs = Dedup.verifyFromSignatures(Dedup.candidatesFromSignatures(sigs), sigs)
      .filter(col("est_jaccard") >= 0.8)
      .select(col("a_id"), col("b_id"))
    val clusters = Components.connectedComponents(pairs)
    // docs in no near-dup pair represent themselves
    val reps = docs.select(col("doc_id"))
      .join(clusters.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("rep_id"))
    reps.groupBy((col("doc_id") === col("rep_id")).as("is_kept"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("is_kept")
  }

  /** pipeline_near_dedup_exact: the near-dedup PIPELINE gated end to end
    * (signatures → banding → candidates → signature-verify → connected
    * components → per-doc representative) — the [[dedupMinhashExact]]
    * construction lifted to the whole composition. Threshold 1.0 makes
    * cluster membership ≡ full-signature equality (an equivalence
    * relation, so CC's transitive closure adds nothing new), and the
    * disjoint-shingle synthetic corpus (every 3-shingle carries the
    * doc's own id; identical-text twins planted for doc_id%2==0) makes
    * signature equality ≡ digest equality — so DuckDB recomputes every
    * doc's representative as the min doc_id sharing its digest. */
  val pipelineNearDedupExact: Q = (s, dir) => {
    import graft.operators.Components
    val ids = Tables.documents(s, dir).select("doc_id")
    def synth: org.apache.spark.sql.Column =
      concat(lit("doc "), col("doc_id").cast("string"),
        lit(" alpha "), col("doc_id").cast("string"),
        lit(" beta "), col("doc_id").cast("string"),
        lit(" gamma "), col("doc_id").cast("string"))
    val base = ids.select(col("doc_id"), synth.as("text"))
    val twins = base.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
    val docs = base.unionAll(twins)
    val sigs = Dedup.minhashSignatures(docs, col("text"), col("doc_id")).localCheckpoint(true)
    val pairs = Dedup.verifyFromSignatures(Dedup.candidatesFromSignatures(sigs), sigs)
      .filter(col("est_jaccard") >= 1.0)
      .select(col("a_id"), col("b_id"))
    val clusters = Components.connectedComponents(pairs)
    docs.select(col("doc_id"))
      .join(clusters.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("rep_id"))
      .orderBy("doc_id")
  }

  val pipelineNearDedupExactSql =
    """WITH ids AS (SELECT doc_id FROM documents),
      |u AS (
      |  SELECT doc_id,
      |    md5('doc ' || doc_id || ' alpha ' || doc_id || ' beta ' || doc_id || ' gamma ' || doc_id) AS d
      |  FROM ids
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    md5('doc ' || doc_id || ' alpha ' || doc_id || ' beta ' || doc_id || ' gamma ' || doc_id) AS d
      |  FROM ids WHERE doc_id % 2 = 0)
      |SELECT a.doc_id, min(b.doc_id) AS rep_id
      |FROM u a JOIN u b ON a.d = b.d
      |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin

  // ---- multimodal ---------------------------------------------------------

  /** multimodal_doc: nested "document" record — text + typed metadata +
    * embedding norm from a dim join (documents ⋈ embeddings on id).
    * The nested struct is serialized with to_json for the gate: the
    * driver's pandas comparator can't hash a raw struct (dict), and both
    * engines emit identical compact JSON for ASCII struct fields. */
  val multimodalDoc: Q = (s, dir) =>
    Tables.documents(s, dir)
      .join(Tables.embeddings(s, dir), col("doc_id") === col("vec_id"))
      .select(col("doc_id"),
        to_json(struct(col("text"), col("lang"), col("source"))).as("doc"),
        r4(VectorOps.norm2(col("embedding"))).as("emb_norm2"))
      .orderBy("doc_id")

  val multimodalDocSql =
    """SELECT doc_id, CAST(to_json(struct_pack(text := text, lang := lang, source := source)) AS VARCHAR) AS doc,
      |  floor((list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 10000 + 0.5) / 10000 AS emb_norm2
      |FROM documents JOIN embeddings ON doc_id = vec_id
      |ORDER BY doc_id""".stripMargin

  /** multimodal_features: binary-column plumbing — opaque bytes + derived
    * features (length, content digest); see operators.Multimodal for the
    * full decode pipeline. */
  val multimodalFeatures: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        length(col("text").cast("binary")).as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("digest"))
      .orderBy("doc_id")

  val multimodalFeaturesSql =
    """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
      |  sha256(text) AS digest
      |FROM documents ORDER BY doc_id""".stripMargin

  /** multimodal_resize: binary-asset resize with a REAL `javax.imageio`
    * decode (VERDICT r03 #8 — no longer a stub for images): image-kind
    * assets carry real rendered PNGs, are decoded, reported at their TRUE
    * source dimensions, bilinear-scaled to 64×48 and re-encoded;
    * non-image kinds take the deterministic stub path (`decoded=false`).
    * Rows-only (PNG encoder bytes are JVM-library-specific); decode
    * correctness (true dims in → true dims out) unit-tested in
    * MultimodalLangIdSpec. */
  /** multimodal_dedup: perceptual image dedup over REAL decoded PNGs —
    * [[graft.operators.Multimodal.aHash]] (decode → 8×8 bilinear → luma
    * threshold) grouped to duplicate sets, keep = smallest asset id.
    * Duplicates are PLANTED: each image asset renders from seed
    * `asset_id % 16` (not its id), so the 16 seed classes are exact
    * perceptual duplicates and the gate's oracle can recompute the
    * group structure (keep_id, n_dups per class) WITHOUT a codec —
    * identical bytes always hash equal, and a cross-class aHash
    * collision (≈ 16²/2⁶⁵) would fail the gate rather than hide.
    * Bytes never shuffle: the decode+hash pass is narrow, only
    * (id, 8-byte hash) crosses the exchange. */
  val multimodalDedup: Q = (s, dir) => {
    import graft.operators.Multimodal
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .repartition(s.sessionState.conf.numShufflePartitions)
    val rendered = Multimodal.assetsFromDocuments(docs)
      .filter(_.kind == "image")
      .mapPartitions(_.map(a =>
        a.copy(bytes = Multimodal.renderPng(24, 24, a.asset_id % 16),
          meta_width = 24, meta_height = 24)))
    Multimodal.perceptualDedup(rendered).orderBy("keep_id")
  }

  val multimodalDedupSql: String =
    """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
      |FROM documents WHERE doc_id % 3 = 0
      |GROUP BY doc_id % 16 HAVING count(*) >= 2
      |ORDER BY keep_id""".stripMargin

  /** multimodal_phash: the DCT perceptual hash
    * ([[graft.operators.Multimodal.pHash]]: 32×32 luma → 2-D DCT-II →
    * 8×8 low-frequency block → median threshold) over the same rendered
    * PNG corpus as `multimodal_dedup` — the recompression-robust member
    * of the pHash/dHash/aHash family, with real spectral math over real
    * decoded pixels. Same planted-class gate: identical bytes hash
    * equal, a cross-class collision (≈16²/2⁶⁵) would FAIL the gate. */
  val multimodalPhash: Q = (s, dir) => {
    import graft.operators.Multimodal
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .repartition(s.sessionState.conf.numShufflePartitions)
    val rendered = Multimodal.assetsFromDocuments(docs)
      .filter(_.kind == "image")
      .mapPartitions(_.map(a =>
        a.copy(bytes = Multimodal.renderPng(24, 24, a.asset_id % 16),
          meta_width = 24, meta_height = 24)))
    Multimodal.perceptualDedupBy(rendered, Multimodal.pHash).orderBy("keep_id")
  }

  val multimodalPhashSql: String = multimodalDedupSql

  val multimodalResize: Q = (s, dir) => {
    import graft.operators.Multimodal
    // decode parallelism = upstream partition count (the Multimodal scale
    // contract): the documents fixture is ONE parquet split, so without
    // this repartition the whole render+decode pass serializes onto one
    // task (measured 6.8 s → sub-second at 32 way)
    val docs = Tables.documents(s, dir)
      .repartition(s.sessionState.conf.numShufflePartitions)
    val assets = Multimodal.withRenderedImages(
      Multimodal.assetsFromDocuments(docs))
    Multimodal.resizeImages(assets, 64, 48).toDF()
      .select(col("asset_id"), col("kind"), col("decoded"),
        col("orig_width"), col("orig_height"),
        col("meta_width"), col("meta_height"))
      .orderBy("asset_id")
  }

  /** Oracle for the metadata half of multimodal_resize (round-7 verdict
    * ask #4): every output column except the PNG payload is a
    * deterministic function of doc_id — kind = id mod 3, rendered source
    * dims = id mod 64/48 + 8 (Multimodal.withRenderedImages), target dims
    * = the constant (64, 48), decoded ⇔ image kind (text bytes are never
    * a decodable image; rendered PNGs always are). DuckDB recomputes the
    * expectations; the real javax.imageio decode must reproduce them —
    * a decode failure, dimension swap, or kind misroute breaks the hash.
    * PNG bytes stay rows-only (encoder output is JVM-library-specific),
    * covered by the MultimodalLangIdSpec round-trip. */
  val multimodalResizeSql =
    """SELECT doc_id AS asset_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |  (doc_id % 3 = 0) AS decoded,
      |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 64 + 8 ELSE -1 END AS INT) AS orig_width,
      |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 48 + 8 ELSE -1 END AS INT) AS orig_height,
      |  CAST(64 AS INT) AS meta_width, CAST(48 AS INT) AS meta_height
      |FROM documents
      |ORDER BY asset_id""".stripMargin

  /** multimodal_frames: frame-sampling plan for video assets — every 5th
    * frame index up to 10 per asset, as a pure relational expansion (the
    * planning step that precedes a distributed frame-decode pass; no
    * decode happens here, so this IS oracle-checkable). Frame counts are
    * derived deterministically from asset ids (the fixture carries no
    * real video). */
  val multimodalFrames: Q = (s, dir) => {
    import graft.operators.Multimodal
    val assets = Multimodal.assetsFromDocuments(Tables.documents(s, dir)).toDF()
      .filter(col("kind") === "video")
      .withColumn("n_frames", (pmod(col("asset_id"), lit(100)) + 1).cast("int"))
    Multimodal.sampleFrameIndices(assets, "n_frames", stride = 5, maxFrames = 10)
      .select(col("asset_id"), col("frame_idx").cast("int").as("frame_idx"))
      .orderBy("asset_id", "frame_idx")
  }

  val multimodalFramesSql =
    """SELECT doc_id AS asset_id,
      |  CAST(unnest((range(0, doc_id % 100 + 1, 5))[1:10]) AS INT) AS frame_idx
      |FROM documents WHERE doc_id % 3 = 2
      |ORDER BY asset_id, frame_idx""".stripMargin

  /** search_bm25: topic-relevance selection over the corpus —
    * [[graft.operators.Search.bm25]] (inverted-index shape: postings
    * filtered to the broadcast query-term set BEFORE any shuffle, stats
    * and document frequencies broadcast back, heap top-k). The oracle
    * recomputes the identical Okapi formula in SQL; scores are rounded
    * before the ordering so both engines agree on the cut. */
  val searchBm25: Q = (s, dir) =>
    Search.bm25(Tables.documents(s, dir), col("text"), col("doc_id"),
      queryTerms = Seq("spark", "join", "window"), topK = 20)

  val searchBm25Sql =
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
      |stats AS (SELECT count(*) AS n_docs,
      |    CAST(sum(len(ts)) AS DOUBLE) / count(*) AS avgdl FROM toks),
      |tok AS (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM toks),
      |post AS (SELECT doc_id, dl, term, count(*) AS tf FROM tok
      |  WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2, 3),
      |dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      |scored AS (SELECT p.doc_id,
      |    sum(ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
      |        * (p.tf * (1.2 + 1)) / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / s.avgdl))) AS raw,
      |    count(*) AS n_terms
      |  FROM post p JOIN dfreq f USING (term) CROSS JOIN stats s GROUP BY 1)
      |SELECT doc_id, CAST(n_terms AS INT) AS n_terms,
      |  floor(raw * 10000 + 0.5) / 10000 AS score
      |FROM scored ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** search_bm25_batch: [[searchBm25]]'s production shape — queries as a
    * TABLE, every query's top-k from ONE corpus pass, scoring shared
    * across queries that share terms ([[Search.bm25Batch]]). */
  val searchBm25Batch: Q = (s, dir) => {
    import s.implicits._
    val queries = Seq((1, "spark"), (1, "join"), (2, "window"), (2, "stream"),
      (3, "scan"), (3, "join")).toDF("query_id", "term")
    Search.bm25Batch(Tables.documents(s, dir), col("text"), col("doc_id"),
      queries, topK = 10)
  }

  /** The batch-BM25 CTE chain through `ranked` — shared by the
    * `search_bm25_batch` oracle and the `eval_retrieval_mrr` oracle
    * (which extends it with a relevance pick + reciprocal rank). */
  private val bm25BatchCtes =
    """q(query_id, term) AS (VALUES (1, 'spark'), (1, 'join'), (2, 'window'),
      |    (2, 'stream'), (3, 'scan'), (3, 'join')),
      |toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
      |stats AS (SELECT count(*) AS n_docs,
      |    CAST(sum(len(ts)) AS DOUBLE) / count(*) AS avgdl FROM toks),
      |tok AS (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM toks),
      |post AS (SELECT doc_id, dl, term, count(*) AS tf FROM tok
      |  WHERE term IN (SELECT term FROM q) GROUP BY 1, 2, 3),
      |dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      |scored AS (SELECT q.query_id, p.doc_id,
      |    sum(ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
      |        * (p.tf * (1.2 + 1)) / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / s.avgdl))) AS raw,
      |    count(*) AS n_terms
      |  FROM post p JOIN dfreq f USING (term) JOIN q USING (term)
      |  CROSS JOIN stats s GROUP BY 1, 2),
      |ranked AS (SELECT query_id, doc_id, CAST(n_terms AS INT) AS n_terms,
      |    floor(raw * 10000 + 0.5) / 10000 AS score,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY floor(raw * 10000 + 0.5) / 10000 DESC, doc_id) AS rn
      |  FROM scored)""".stripMargin

  val searchBm25BatchSql =
    s"""WITH $bm25BatchCtes
       |SELECT query_id, doc_id, n_terms, score FROM ranked WHERE rn <= 10
       |ORDER BY query_id, score DESC, doc_id""".stripMargin

  /** eval_retrieval_mrr: MRR@10 of the gated BM25 batch ranking against
    * a DETERMINISTIC relevance rule — per query, the relevant doc is the
    * one matching the most query terms, tie-broken by highest total
    * term frequency then smallest doc_id (the standard planted-relevance
    * pick: the strongest lexical match by pure term counts, independent
    * of BM25's idf/length weighting); rr = 1/rank if it appears in the
    * top-10, else 0. The retrieval-evaluation member of the `eval_`
    * family beside `eval_ann_recall`: a search pipeline without its own
    * quality metric can't be tuned.
    *
    * Scale shape: the ranking is `search_bm25_batch`'s posting
    * discipline; the relevance pick consumes the SAME query-term
    * postings frame the ranking is built on ([[Search.queryPostings]],
    * round 16) — the identically built subtree canonicalizes equal, so
    * ReuseExchange evaluates the corpus tokenize/explode ONCE per plan
    * instead of twice, and `matched`/`total_tf` become a plain
    * count/sum over the per-(doc, term) `tf` rows (count of distinct
    * matching terms ≡ row count of the already-distinct posting frame;
    * occurrence total ≡ Σ tf) — no count_distinct Expand. The argmax is
    * ONE struct-max aggregate (no window over data); the final join is
    * |queries| rows against the ≤10·|queries| ranked frame. rr = one r8
    * IEEE division of an integer rank. */
  val evalRetrievalMrr: Q = (s, dir) => {
    import s.implicits._
    val queries = Seq((1, "spark"), (1, "join"), (2, "window"), (2, "stream"),
      (3, "scan"), (3, "join")).toDF("query_id", "term")
    val docs = Tables.documents(s, dir)
    val ranked = Search.bm25Batch(docs, col("text"), col("doc_id"),
      queries, topK = 10)
    val relevant = Search.queryPostings(docs, col("text"), col("doc_id"),
        queries.select(col("term")).distinct())
      .join(broadcast(queries.distinct()), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("matched"),
        sum(col("tf")).as("total_tf"))
      .groupBy("query_id")
      .agg(max(struct(col("matched"), col("total_tf"),
        (-col("doc_id")).as("nid"))).as("best"))
      .select(col("query_id"), (-col("best.nid")).as("relevant_doc"),
        col("best.matched").as("matched"), col("best.total_tf").as("total_tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
    val withRank = ranked.withColumn("rnk", row_number().over(w))
      .select(col("query_id"), col("doc_id").as("relevant_doc"), col("rnk"))
    relevant.join(withRank, Seq("query_id", "relevant_doc"), "left_outer")
      .select(col("query_id"), col("relevant_doc"), col("matched"),
        col("total_tf"), coalesce(col("rnk"), lit(0)).as("rnk"),
        coalesce(graft.functions.Num.r8(lit(1.0) / col("rnk").cast("double")),
          lit(0.0)).as("rr"))
      .orderBy("query_id")
  }

  val evalRetrievalMrrSql: String =
    s"""WITH $bm25BatchCtes,
       |m AS (SELECT q.query_id, t.doc_id,
       |    count(DISTINCT t.term) AS matched, count(*) AS total_tf
       |  FROM tok t JOIN q ON q.term = t.term GROUP BY 1, 2),
       |rel AS (SELECT query_id, doc_id AS relevant_doc, matched, total_tf
       |  FROM (SELECT query_id, doc_id, matched, total_tf,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY matched DESC, total_tf DESC, doc_id ASC) AS pick
       |    FROM m) WHERE pick = 1),
       |rk AS (SELECT query_id, doc_id, rn FROM ranked WHERE rn <= 10)
       |SELECT rel.query_id, rel.relevant_doc,
       |  CAST(rel.matched AS BIGINT) AS matched,
       |  CAST(rel.total_tf AS BIGINT) AS total_tf,
       |  CAST(coalesce(rk.rn, 0) AS INT) AS rnk,
       |  CASE WHEN rk.rn IS NOT NULL
       |    THEN floor(1.0 / rk.rn * 100000000 + 0.5) / 100000000
       |    ELSE 0.0 END AS rr
       |FROM rel LEFT JOIN rk ON rk.query_id = rel.query_id
       |  AND rk.doc_id = rel.relevant_doc
       |ORDER BY rel.query_id""".stripMargin

  /** 1/log2(i+1) DCG position weights for i = 1..10, quantized ONCE
    * driver-side to 1e8 micro-units. The SAME Long literals land in the
    * Spark plan (broadcast 10-row frame) and the oracle SQL (VALUES
    * list), so neither engine evaluates a logarithm — the §7.4
    * shared-constant recipe. */
  private val ndcgWeights: Seq[(Int, Long)] =
    (1 to 10).map(i => i -> math.round(1e8 * math.log(2.0) / math.log(i + 1.0)))

  /** eval_retrieval_ndcg: NDCG@10 of the gated BM25 batch ranking under
    * GRADED relevance — grade(query, doc) = distinct query terms the doc
    * contains (0/1/2 for these two-term queries), gain = 2^grade − 1,
    * position weights 1/log2(rank+1). DCG sums the actual top-10's
    * gains; IDCG re-sorts ALL matched docs by (grade desc, doc_id) and
    * takes the best 10; ndcg = dcg/idcg. Completes the retrieval-eval
    * family (`eval_retrieval_mrr` = single-relevant rank quality,
    * `eval_ann_recall`/`eval_pq_recall` = vector side): NDCG is the
    * metric that sees partial credit, which MRR cannot.
    *
    * Exactness: gains are integers (`1 << grade − 1`), weights the
    * shared micro-unit literals above, so dcg/idcg are exact BIGINT
    * micro-sums (≤ 3·10⁹ ≪ 2⁵³); ndcg is ONE r8-gridded IEEE division.
    * Scale shape: the grade stream is pruned by a broadcast semi-join
    * on query terms BEFORE any shuffle (posting discipline); the ideal
    * window ranks only term-matched docs per query; the weight table is
    * a broadcast 10-row frame. */
  val evalRetrievalNdcg: Q = (s, dir) => {
    import s.implicits._
    val queries = Seq((1, "spark"), (1, "join"), (2, "window"), (2, "stream"),
      (3, "scan"), (3, "join")).toDF("query_id", "term")
    val docs = Tables.documents(s, dir)
    val ranked = Search.bm25Batch(docs, col("text"), col("doc_id"),
      queries, topK = 10)
    // per-doc term dedup is ROW-LOCAL (round 15): array_distinct before
    // the explode makes each (doc, term) pair unique, so the grade is a
    // plain count — no count_distinct expand — and the exploded stream
    // the semi-join and the aggregate see carries distinct-per-doc rows
    // only. (A cut of this frame was tried for its two consumers and
    // REVERTED: at sf0.1 it serialized two subtrees the scheduler was
    // running concurrently — measured 1.64 → 2.53 s.)
    val grades = docs
      .select(col("doc_id"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
      .join(broadcast(queries.select("term").distinct()), Seq("term"), "left_semi")
      .join(broadcast(queries.distinct()), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("grade"))
    val wDf = ndcgWeights.toDF("rnk", "w")
    val gain = expr("shiftleft(CAST(1 AS BIGINT), CAST(grade AS INT)) - 1")
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
    val dcg = ranked.withColumn("rnk", row_number().over(rw))
      .join(grades, Seq("query_id", "doc_id"), "left_outer")
      .na.fill(0L, Seq("grade"))
      .join(broadcast(wDf), Seq("rnk"))
      .groupBy("query_id").agg(sum(gain * col("w")).as("dcg_micro"))
    val iw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("grade").desc, col("doc_id").asc)
    val idcg = grades.withColumn("rnk", row_number().over(iw))
      .filter(col("rnk") <= 10)
      .join(broadcast(wDf), Seq("rnk"))
      .groupBy("query_id").agg(sum(gain * col("w")).as("idcg_micro"))
    dcg.join(idcg, Seq("query_id"))
      .select(col("query_id"), col("dcg_micro"), col("idcg_micro"),
        graft.functions.Num.r8(
          col("dcg_micro").cast("double") / col("idcg_micro").cast("double"))
          .as("ndcg"))
      .orderBy("query_id")
  }

  val evalRetrievalNdcgSql: String = {
    val wt = ndcgWeights.map { case (i, w) => s"($i, $w)" }.mkString(", ")
    s"""WITH $bm25BatchCtes,
       |wt(rnk, w) AS (VALUES $wt),
       |m AS (SELECT q.query_id, t.doc_id, count(DISTINCT t.term) AS grade
       |  FROM tok t JOIN q ON q.term = t.term GROUP BY 1, 2),
       |dcg AS (SELECT r.query_id,
       |    CAST(sum(coalesce((CAST(1 AS BIGINT) << m.grade) - 1, 0) * wt.w) AS BIGINT)
       |      AS dcg_micro
       |  FROM ranked r JOIN wt ON wt.rnk = r.rn
       |  LEFT JOIN m ON m.query_id = r.query_id AND m.doc_id = r.doc_id
       |  WHERE r.rn <= 10 GROUP BY 1),
       |ideal AS (SELECT query_id, grade, row_number() OVER (PARTITION BY query_id
       |    ORDER BY grade DESC, doc_id ASC) AS rnk FROM m),
       |idcg AS (SELECT query_id,
       |    CAST(sum(((CAST(1 AS BIGINT) << grade) - 1) * wt.w) AS BIGINT) AS idcg_micro
       |  FROM ideal JOIN wt ON wt.rnk = ideal.rnk
       |  WHERE ideal.rnk <= 10 GROUP BY 1)
       |SELECT d.query_id, d.dcg_micro, i.idcg_micro,
       |  ${graft.functions.Num.r8Sql("CAST(d.dcg_micro AS DOUBLE) / i.idcg_micro")} AS ndcg
       |FROM dcg d JOIN idcg i ON i.query_id = d.query_id
       |ORDER BY d.query_id""".stripMargin
  }

  /** dedup_spans: C4-style span-level exact dedup —
    * [[graft.operators.Dedup.spanDedup]] tiles docs into 10-token spans,
    * keeps each span's first corpus occurrence, reassembles. Winner
    * election ships (digest, ids) only; the oracle elects winners over
    * the span TEXT itself (md5-equal ⇔ text-equal), so a digest-side
    * mistake cannot silently agree. */
  val dedupSpans: Q = (s, dir) =>
    Dedup.spanDedup(Tables.documents(s, dir), col("text"), col("doc_id"),
        tileTokens = 10)
      .orderBy("doc_id")

  val dedupSpansSql =
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
      |tiles AS (SELECT doc_id, ts,
      |    unnest(generate_series(0, CAST(ceil(len(ts) / 10.0) AS BIGINT) - 1)) AS tile_idx
      |  FROM toks),
      |tt AS (SELECT doc_id, tile_idx,
      |    array_to_string(ts[(tile_idx * 10 + 1):(tile_idx * 10 + 10)], ' ') AS tile_text
      |  FROM tiles),
      |win AS (SELECT doc_id, tile_idx, tile_text,
      |    row_number() OVER (PARTITION BY tile_text ORDER BY doc_id, tile_idx) AS rn
      |  FROM tt),
      |kept AS (SELECT doc_id, count(*) AS n_kept,
      |    string_agg(tile_text, ' ' ORDER BY tile_idx) AS dedup_text
      |  FROM win WHERE rn = 1 GROUP BY doc_id)
      |SELECT t.doc_id, CAST(ceil(len(t.ts) / 10.0) AS INT) AS n_tiles,
      |  CAST(coalesce(k.n_kept, 0) AS INT) AS n_kept,
      |  coalesce(k.dedup_text, '') AS dedup_text
      |FROM toks t LEFT JOIN kept k USING (doc_id) ORDER BY t.doc_id""".stripMargin

  // ---- registry -----------------------------------------------------------

  val all: Map[String, Q] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_spans" -> dedupSpans,
    "search_bm25" -> searchBm25,
    "search_bm25_batch" -> searchBm25Batch,
    "dedup_incremental" -> dedupIncremental,
    "dedup_incremental_minhash" -> dedupIncrementalMinhash,
    "dedup_incremental_minhash_exact" -> dedupIncrementalMinhashExact,
    "dedup_url" -> dedupUrl,
    "dedup_url_params" -> dedupUrlParams,
    "contamination_check" -> contaminationCheck,
    "dedup_jaccard" -> dedupJaccard,
    "dedup_editdist" -> dedupEditdist,
    "dedup_containment" -> dedupContainment,
    "dedup_minhash" -> dedupMinhash,
    "dedup_minhash_exact" -> dedupMinhashExact,
    "dedup_simhash" -> dedupSimhash,
    "dedup_simhash_exact" -> dedupSimhashExact,
    "sim_topk_cosine" -> simTopkCosine,
    "sim_mmr_rerank" -> simMmrRerank,
    "sim_pairs_threshold" -> simPairsThreshold,
    "sim_pairs_lsh" -> simPairsLsh,
    "sim_pairs_lsh_loose" -> simPairsLshLoose,
    "dedup_semantic" -> dedupSemantic,
    "dedup_semantic_lsh" -> dedupSemanticLsh,
    "dedup_semantic_lsh_loose" -> dedupSemanticLshLoose,
    "sketch_source_sim" -> sketchSourceSim,
    "sketch_source_sim_exact" -> sketchSourceSimExact,
    "sketch_hll_union" -> sketchHllUnion,
    "sketch_hll_union_exact" -> sketchHllUnionExact,
    "sketch_cms_counts" -> sketchCmsCounts,
    "sim_ann_lsh" -> simAnnLsh,
    "sim_ann_lsh_twins" -> simAnnLshTwins,
    "sim_ann_multiprobe" -> simAnnMultiprobe,
    "sim_ann_multiprobe_twins" -> simAnnMultiprobeTwins,
    "sim_ann_ivf" -> simAnnIvf,
    "sim_ann_ivf_twins" -> simAnnIvfTwins,
    "sim_ann_ivf_kmeans" -> simAnnIvfKmeans,
    "sim_knn_graph" -> simKnnGraph,
    "sim_knn_graph_banded" -> simKnnGraphBanded,
    "sim_knn_graph_ivf_twins" -> simKnnGraphIvfTwins,
    "sim_knn_graph_banded_twins" -> simKnnGraphBandedTwins,
    "sim_knn_exact" -> simKnnExact,
    "text_tokens" -> textTokens,
    "text_stats" -> textStats,
    "text_readability" -> textReadability,
    "curate_boilerplate_phrases" -> curateBoilerplatePhrases,
    "text_quality" -> textQuality,
    "text_entropy" -> textEntropy,
    "text_repetition" -> textRepetition,
    "text_ngram_lm" -> textNgramLm,
    "pipeline_quality_filter" -> pipelineQualityFilter,
    "text_pii_scrub" -> textPiiScrub,
    "text_vocab" -> textVocab,
    "text_pmi_bigrams" -> textPmiBigrams,
    "text_tfidf_keywords" -> textTfidfKeywords,
    "text_hash_features" -> textHashFeatures,
    "eval_retrieval_mrr" -> evalRetrievalMrr,
    "eval_retrieval_ndcg" -> evalRetrievalNdcg,
    "text_zipf_fit" -> textZipfFit,
    "text_vocab_approx" -> textVocabApprox,
    "text_token_count" -> textTokenCount,
    "bpe_merges" -> bpeMerges,
    "bpe_encode" -> bpeEncode,
    "bpe_encode_fixed" -> bpeEncodeFixed,
    "text_langid" -> textLangid,
    "text_langid_exact" -> textLangidExact,
    "text_fingerprint" -> textFingerprint,
    "text_fingerprint_dedup" -> textFingerprintDedup,
    "sample_hash" -> sampleHash,
    "sample_mixture" -> sampleMixture,
    "sample_token_budget" -> sampleTokenBudget,
    "sample_temperature" -> sampleTemperature,
    "sample_temperature_rank" -> sampleTemperatureRank,
    "sample_quality_weighted" -> sampleQualityWeighted,
    "split_assign" -> splitAssign,
    "dq_split_leakage" -> dqSplitLeakage,
    "curate_gopher_rules" -> curateGopherRules,
    "curate_host_cap" -> curateHostCap,
    "sample_reservoir_weighted" -> sampleReservoirWeighted,
    "sample_stratified" -> sampleStratified,
    "sample_stratified_exact" -> sampleStratifiedExact,
    "pack_chunks" -> packChunks,
    "pack_shards" -> packShards,
    "curriculum_bins" -> curriculumBins,
    "pipeline_curate" -> pipelineCurate,
    "curate_source_hhi" -> curateSourceHhi,
    "curate_source_entropy" -> curateSourceEntropy,
    "curate_quality_ensemble" -> curateQualityEnsemble,
    "curate_dsir" -> curateDsir,
    "curate_ngram_ppl" -> curateNgramPpl,
    "pipeline_pretrain" -> pipelinePretrain,
    "pipeline_near_dedup" -> pipelineNearDedup,
    "pipeline_near_dedup_exact" -> pipelineNearDedupExact,
    "pipeline_rag_prep" -> pipelineRagPrep,
    "eval_pack_efficiency" -> evalPackEfficiency,
    "multimodal_doc" -> multimodalDoc,
    "multimodal_features" -> multimodalFeatures,
    "multimodal_resize" -> multimodalResize,
    "multimodal_dedup" -> multimodalDedup,
    "multimodal_phash" -> multimodalPhash,
    "multimodal_frames" -> multimodalFrames
  )

  val oracles: Map[String, String] = Map(
    "bpe_encode_fixed" -> bpeEncodeFixedSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_spans" -> dedupSpansSql,
    "search_bm25" -> searchBm25Sql,
    "search_bm25_batch" -> searchBm25BatchSql,
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_url" -> dedupUrlSql,
    "dedup_url_params" -> dedupUrlParamsSql,
    "contamination_check" -> contaminationCheckSql,
    "dedup_jaccard" -> dedupJaccardSql,
    "dedup_editdist" -> dedupEditdistSql,
    "dedup_containment" -> dedupContainmentSql,
    "dedup_minhash_exact" -> dedupMinhashExactSql,
    "dedup_simhash_exact" -> dedupSimhashExactSql,
    "sketch_source_sim_exact" -> sketchSourceSimExactSql,
    "sketch_hll_union_exact" -> sketchHllUnionExactSql,
    "sketch_cms_counts" -> sketchCmsCountsSql,
    "sim_ann_lsh_twins" -> simAnnTwinsSql,
    "sim_ann_multiprobe_twins" -> simAnnTwinsSql,
    "sim_ann_ivf_twins" -> simAnnTwinsSql,
    "text_fingerprint_dedup" -> textFingerprintDedupSql,
    "dedup_incremental_minhash_exact" -> dedupIncrementalMinhashExactSql,
    "pipeline_near_dedup_exact" -> pipelineNearDedupExactSql,
    "pipeline_rag_prep" -> pipelineRagPrepSql,
    "eval_pack_efficiency" -> evalPackEfficiencySql,
    "text_langid_exact" -> textLangidExactSql,
    "sim_topk_cosine" -> simTopkCosineSql,
    "sim_mmr_rerank" -> simMmrRerankSql,
    "sim_knn_exact" -> simKnnExactSql,
    "sim_knn_graph_ivf_twins" -> simKnnGraphIvfTwinsSql,
    "sim_knn_graph_banded_twins" -> simKnnGraphBandedTwinsSql,
    "sim_pairs_threshold" -> simPairsThresholdSql,
    "sim_pairs_lsh" -> simPairsLshSql,
    "dedup_semantic" -> dedupSemanticSql,
    "dedup_semantic_lsh" -> dedupSemanticLshSql,
    "text_tokens" -> textTokensSql,
    "text_stats" -> textStatsSql,
    "text_readability" -> textReadabilitySql,
    "curate_boilerplate_phrases" -> curateBoilerplatePhrasesSql,
    "text_quality" -> textQualitySql,
    "text_entropy" -> textEntropySql,
    "text_repetition" -> textRepetitionSql,
    "text_ngram_lm" -> textNgramLmSql,
    "pipeline_quality_filter" -> pipelineQualityFilterSql,
    "text_pii_scrub" -> textPiiScrubSql,
    "text_vocab" -> textVocabSql,
    "text_pmi_bigrams" -> textPmiBigramsSql,
    "text_tfidf_keywords" -> textTfidfKeywordsSql,
    "text_hash_features" -> textHashFeaturesSql,
    "eval_retrieval_mrr" -> evalRetrievalMrrSql,
    "eval_retrieval_ndcg" -> evalRetrievalNdcgSql,
    "text_zipf_fit" -> textZipfFitSql,
    "text_vocab_approx" -> textVocabApproxSql,
    "text_token_count" -> textTokenCountSql,
    "multimodal_doc" -> multimodalDocSql,
    "multimodal_features" -> multimodalFeaturesSql,
    "multimodal_resize" -> multimodalResizeSql,
    "multimodal_dedup" -> multimodalDedupSql,
    "multimodal_phash" -> multimodalPhashSql,
    "multimodal_frames" -> multimodalFramesSql,
    "sample_hash" -> sampleHashSql,
    "sample_mixture" -> sampleMixtureSql,
    "sample_token_budget" -> sampleTokenBudgetSql,
    "sample_temperature" -> sampleTemperatureSql,
    "sample_temperature_rank" -> sampleTemperatureRankSql,
    "sample_quality_weighted" -> sampleQualityWeightedSql,
    "split_assign" -> splitAssignSql,
    "dq_split_leakage" -> dqSplitLeakageSql,
    "curate_gopher_rules" -> curateGopherRulesSql,
    "curate_host_cap" -> curateHostCapSql,
    "sample_reservoir_weighted" -> sampleReservoirWeightedSql,
    "sample_stratified" -> sampleStratifiedSql,
    "sample_stratified_exact" -> sampleStratifiedExactSql,
    "pack_chunks" -> packChunksSql,
    "pack_shards" -> packShardsSql,
    "curriculum_bins" -> curriculumBinsSql,
    "pipeline_curate" -> pipelineCurateSql,
    "curate_source_hhi" -> curateSourceHhiSql,
    "curate_source_entropy" -> curateSourceEntropySql,
    "curate_quality_ensemble" -> curateQualityEnsembleSql,
    "curate_dsir" -> curateDsirSql,
    "curate_ngram_ppl" -> curateNgramPplSql,
    "pipeline_pretrain" -> pipelinePretrainSql
  )
}

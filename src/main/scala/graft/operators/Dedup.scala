package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.functions.Num.r4

/** Deduplication family (driver north star; SURVEY.md §2.11):
  * exact, MinHash+LSH, SimHash, and token-set Jaccard.
  *
  * Scale design:
  *  - exact: one hash-groupBy shuffle on a 128-bit digest — the canonical
  *    100 TB dedup; the shuffle moves (digest, id) pairs only.
  *  - MinHash/LSH: per-row signatures (no shuffle), then an explode on
  *    (band, bandHash) and a groupBy — candidate generation is linear in
  *    docs × bands; only colliding buckets ever meet, so there is no O(n²)
  *    stage. Verification re-scores candidate pairs only.
  *  - SimHash: per-row 64-bit sketch; near-dup candidates via banding the
  *    sketch into 4×16-bit chunks (Hamming ≤ 3 ⇒ at least one chunk equal
  *    — pigeonhole), then exact Hamming check on candidates.
  *  - Jaccard: sparse similarity join — explode distinct tokens, self-join
  *    on token, count intersections, then size-join; skew hazard is a
  *    stop-token whose posting list explodes, so callers can cap document
  *    frequency (`maxDf`).
  */
object Dedup {

  /** Exact dedup: normalize → md5 → keep min id per digest. */
  def exact(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(md5(lower(trim(text))).as("text_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Incremental exact dedup — the PRODUCTION shape of corpus ingestion:
    * at 100 TB you never re-dedup the world, you dedup today's batch
    * against yesterday's state. `stateHashes` is the persisted digest set
    * from prior runs (one `text_hash` column); the batch is deduped
    * within itself (min-id per digest, batch dup count carried) and then
    * anti-joined against the state, so only first-seen content survives.
    *
    * Scale: the anti-join shuffles 16-byte digests, never text — the
    * state side ships (digest) and the batch side ships (digest, id,
    * count). The batch is typically ≪ state; with the state stored
    * hash-bucketed ([[graft.sources.Bucketing]]) the state side's
    * exchange disappears, and a bloom prefilter
    * ([[RangeJoin.semiWithBloom]]'s complement) can drop most of the
    * batch before the exact anti-join. New state = old state ∪ the
    * emitted hashes — same column, appendable without rewrite. */
  def incrementalExact(batch: DataFrame, stateHashes: DataFrame,
      text: Column, id: Column): DataFrame =
    batch.groupBy(md5(lower(trim(text))).as("text_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_batch_dups"))
      .join(stateHashes.select(col("text_hash")), Seq("text_hash"), "left_anti")

  /** MinHash signatures as a DataFrame (doc_id, sig ARRAY<BIGINT>):
    * `numPerm` permutations approximated by salted xxhash64 over
    * `shingleSize`-word shingles (deterministic, no RNG).
    *
    * Per-row codegen kernel ([[graft.plans.TextKernels.minhashSig]]) —
    * ZERO shuffle: the signature is a narrow projection, so at 100 TB
    * this stage is a pure scan. It also hashes each shingle's bytes once
    * and applies `numPerm` cheap integer mixes, where the aggregate form
    * ([[minhashSignaturesAgg]]) re-hashes the whole shingle string per
    * permutation. Bit-identical to the aggregate form (TextKernelsSpec);
    * docs with a NULL text yield a NULL signature here (the explode form
    * drops them). */
  def minhashSignatures(df: DataFrame, text: Column, id: Column,
      numPerm: Int = 64, shingleSize: Int = 3): DataFrame =
    df.select(id.as("doc_id"),
      graft.plans.TextExpressions.minhashSig(text, numPerm, shingleSize).as("sig"))

  /** The explode + `numPerm`-min-buffer aggregate formulation of
    * [[minhashSignatures]] — one shuffle on doc_id, partial+final
    * aggregation with fixed 8·numPerm-byte buffers. Kept as the
    * cross-check baseline (and the shape a pure-SQL engine would use);
    * the per-row kernel replaced it as the default after measuring.
    * (A per-row nested-HOF formulation also exists in git history —
    * interpreted evaluation made it orders of magnitude slower.) */
  def minhashSignaturesAgg(df: DataFrame, text: Column, id: Column,
      numPerm: Int = 64, shingleSize: Int = 3): DataFrame = {
    // codegen shingle rows; min over the multiset == min over the set, so
    // no distinct() shuffle is needed before the aggregate
    val ex = TextOps.shingleRows(df, text, id, shingleSize)
    val aggs = (0 until numPerm).map(i => min(xxhash64(col("sh"), lit(i))).as(s"h$i"))
    val sigs = ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numPerm).map(i => col(s"h$i")): _*).as("sig"))
    // docs with < shingleSize tokens emit no shingle rows: restore them
    // with the sentinel signature (identical short docs still collide).
    // NULL-text docs ALSO emit no rows but must restore to a NULL
    // signature — the kernel form's contract — not the sentinel, which
    // would make them collide in every band with every short doc
    df.select(id.as("doc_id"), text.isNull.as("__null_text"))
      .join(sigs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__null_text"), lit(null))
          .otherwise(coalesce(col("sig"), array_repeat(lit(Long.MaxValue), numPerm)))
          .as("sig"))
  }

  /** LSH banding over a signatures frame: (doc_id, band_id, band_hash)
    * rows; b bands of r signature positions — docs agreeing on any full
    * band collide. */
  def lshBands(sigs: DataFrame, bands: Int, rows: Int): DataFrame =
    sigs.select(col("doc_id"),
        explode(array((0 until bands).map(b => struct(lit(b).as("band_id"),
          xxhash64(lit(b), slice(col("sig"), b * rows + 1, rows)).as("band_hash"))): _*)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))

  /** Candidate near-dup pairs from LSH buckets (a_id < b_id, distinct).
    * Self-join per bucket: bucket sizes are small by construction; the one
    * skew case — a hot bucket (all-identical viral spam) — is capped by
    * [[HotBucket.guardedSelfJoinPairs]]'s frequency guard. */
  def minhashCandidates(df: DataFrame, text: Column, id: Column,
      numPerm: Int = 64, shingleSize: Int = 3, bands: Int = 16): DataFrame =
    candidatesFromSignatures(minhashSignatures(df, text, id, numPerm, shingleSize), numPerm, bands)

  /** Candidate pairs from a precomputed signatures frame — callers doing
    * candidates + verification persist the signatures once and reuse them
    * (the signature aggregate is the expensive stage). `maxBucket` is the
    * hot-bucket guard (see [[HotBucket]]): buckets above it contribute
    * star pairs to their minimum id instead of all pairs. */
  def candidatesFromSignatures(sigs: DataFrame, numPerm: Int = 64, bands: Int = 16,
      maxBucket: Int = HotBucket.defaultMaxBucket): DataFrame = {
    // bucket-key distribution + checkpoint live inside the guard
    HotBucket.guardedSelfJoinPairs(lshBands(sigs, bands, numPerm / bands),
      Seq("band_id", "band_hash"), "doc_id", maxBucket)
  }

  /** MinHash estimated Jaccard for candidate pairs: fraction of agreeing
    * signature positions. */
  def minhashVerify(candidates: DataFrame, docs: DataFrame, text: Column, id: Column,
      numPerm: Int = 64, shingleSize: Int = 3): DataFrame =
    verifyFromSignatures(candidates, minhashSignatures(docs, text, id, numPerm, shingleSize), numPerm)

  /** Estimate Jaccard for candidate pairs from a precomputed signatures
    * frame. */
  def verifyFromSignatures(candidates: DataFrame, sigs: DataFrame, numPerm: Int = 64): DataFrame =
    candidates
      .join(sigs.withColumnRenamed("doc_id", "a_id").withColumnRenamed("sig", "sig_a"), "a_id")
      .join(sigs.withColumnRenamed("doc_id", "b_id").withColumnRenamed("sig", "sig_b"), "b_id")
      .withColumn("est_jaccard",
        r4(aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / numPerm))
      .select("a_id", "b_id", "est_jaccard")

  /** Incremental NEAR-dup dedup: which `batch` docs are near-duplicates
    * (estimated Jaccard ≥ `threshold`) of a PERSISTED corpus state —
    * the production shape of continuous ingestion at 100 TB. The state
    * side is the (doc_id, sig) minhash-signature table written once at
    * ingest: corpus TEXT is never re-read and never shuffles; only
    * fixed-width signatures (numPerm ints) and banded keys move. The
    * batch computes its signatures fresh with the per-row kernel, and
    * candidates come from a banded batch×state JOIN — linear in
    * colliding buckets, never |batch|·|state|. Band-key skew on the
    * state side (a viral duplicate family) is bounded by `maxStateDf`:
    * state buckets above it are truncated to their `maxStateDf` lowest
    * ids. For a family of IDENTICAL signatures (the viral-copy case the
    * cap exists for) detection is unaffected — a batch doc colliding
    * with the family collides with the survivors too, and every member
    * yields the same estimate. For a family of near-VARIANTS sharing a
    * band hash, truncation can drop the batch doc's closest variant:
    * the doc still collides, but its best surviving estimate may be
    * lower, and at the threshold boundary a match can be missed — the
    * skew cap trades that tail for bounded bucket cost (raise
    * `maxStateDf` to shift the trade). QUANTIFIED (round 10, SCALE.md
    * §Round-10): on a planted 20-member family with batch docs whose
    * only above-τ match is a high-id member, recall vs the uncapped run
    * is 0.50 for caps below the targets' bucket rank and 1.0 above —
    * monotone in the cap (kept ids are per-bucket supersets). The
    * min-id star representative is ALREADY retained by construction
    * (truncation keeps lowest ids); the residual miss is the case where
    * the closest variant is evicted AND estimates vs kept members fall
    * below τ. Private-band singleton buckets (never truncated) rescue
    * most targets — the damage concentrates on batch docs whose every
    * colliding band is family-shared. One row per batch doc:
    * (doc_id, is_dup, matched_id, est_jaccard) — matched_id the best
    * state match (highest estimate, lowest id) above threshold, NULL
    * for novel docs. Exact-sibling: [[incrementalExact]]. */
  def incrementalMinhash(batch: DataFrame, stateSigs: DataFrame,
      text: Column, id: Column, threshold: Double = 0.8,
      numPerm: Int = 64, shingleSize: Int = 3, bands: Int = 16,
      maxStateDf: Int = HotBucket.defaultMaxBucket): DataFrame = {
    val r = numPerm / bands
    val bsigs = minhashSignatures(batch, text, id, numPerm, shingleSize)
      .localCheckpoint(true) // read twice: banding + estimate join
    // The state side is ALSO read twice (banding + estimate join), but
    // only a LIVE computation is worth materializing: for the production
    // shape — a persisted signature TABLE backing a 100 TB corpus —
    // eagerly checkpointing would copy the entire state into executor
    // block storage per batch, an unbounded cost to save one parquet
    // re-scan (ADVICE r8). A plain scan (or an already-cached/
    // checkpointed frame) is left as-is; anything with upstream
    // joins/aggregates gets the cut.
    val state =
      if (Checkpointing.isCheapRescan(stateSigs)) stateSigs
      else stateSigs.localCheckpoint(true)
    val stateBands = {
      val sb = lshBands(state, bands, r)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("band_id", "band_hash").orderBy(col("doc_id").asc)
      sb.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= maxStateDf).drop("__rk")
    }
    val cands = lshBands(bsigs, bands, r)
      .join(stateBands.withColumnRenamed("doc_id", "state_id"),
        Seq("band_id", "band_hash"))
      .select(col("doc_id"), col("state_id")).distinct()
    val est = cands
      .join(bsigs, "doc_id")
      .join(state.select(col("doc_id").as("state_id"), col("sig").as("ssig")), "state_id")
      .select(col("doc_id"), col("state_id"),
        r4(aggregate(zip_with(col("sig"), col("ssig"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / numPerm).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
    val best = est.groupBy("doc_id")
      .agg(max_by(struct(col("state_id"), col("est_jaccard")),
        struct(col("est_jaccard"), -col("state_id"))).as("m"))
      .select(col("doc_id"), col("m.state_id").as("matched_id"),
        col("m.est_jaccard").as("est_jaccard"))
    batch.select(id.as("doc_id")).join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("matched_id").isNotNull.as("is_dup"),
        col("matched_id"), col("est_jaccard"))
  }

  /** SimHash sketches as a DataFrame (doc_id, sh BIGINT). Per-row codegen
    * kernel ([[graft.plans.TextKernels.simhash64]]) — a narrow projection
    * with zero shuffle; bit-identical to [[simhashSketchesAgg]] and to the
    * HOF fold `TextOps.simhash64` (TextKernelsSpec). */
  def simhashSketches(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(id.as("doc_id"), graft.plans.TextExpressions.simhash64(text).as("sh"))

  /** The explode + 64-sum-buffer aggregate formulation of
    * [[simhashSketches]] (one shuffle of token rows) — kept as the
    * cross-check baseline for the per-row kernel. */
  def simhashSketchesAgg(df: DataFrame, text: Column, id: Column): DataFrame = {
    val tok = df.select(id.as("doc_id"), explode(TextOps.tokens(text)).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val voteAggs = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"v$i"))
    tok.groupBy("doc_id").agg(voteAggs.head, voteAggs.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i => when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("sh"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (<=
    * chunks-1 guaranteed findable by pigeonhole over `chunks` bands). */
  def simhashPairs(df: DataFrame, text: Column, id: Column, maxHamming: Int = 3): DataFrame = {
    val chunks = 4 // 16 bits each; Hamming<=3 => >=1 chunk equal
    val sh = simhashSketches(df, text, id)
    val banded = Dist.byKeys(
      sh.select(col("doc_id"), col("sh"),
        explode(array((0 until chunks).map(c => struct(lit(c).as("chunk_id"),
          shiftright(col("sh"), c * 16).bitwiseAND(lit(0xFFFFL)).as("chunk_val"))): _*)).as("c"))
        .select(col("doc_id"), col("sh"), col("c.chunk_id"), col("c.chunk_val")),
      col("chunk_id"), col("chunk_val")) // see jaccardPairs
      // eager checkpoint so both self-join sides read the same cached
      // blocks (the jaccardPairs shape — a narrow pipeline on a
      // single-row-group fixture would serialize the join onto one task)
      .localCheckpoint(true)
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.chunk_id") === col("b.chunk_id") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      // filter BEFORE the dedup shuffle: a pair colliding on one chunk
      // with Hamming > maxHamming is decided right at the join — shipping
      // it through distinct() only to drop it afterwards would put the
      // entire rejected-candidate mass on the exchange
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact shingle-set Jaccard similarity join: all pairs with
    * J(shingles(a), shingles(b)) >= threshold. Sparse inverted-index join
    * on the shingle — never materializes the full pair matrix, and word
    * n-gram shingles keep posting lists short even over a tiny vocabulary
    * (unigram posting lists degenerate to ~all-docs). `maxDf` drops
    * shingles whose document frequency exceeds it (stop-shingle skew
    * guard for 100 TB corpora). */
  def jaccardPairs(df: DataFrame, text: Column, id: Column, threshold: Double,
      shingleSize: Int = 3, maxDf: Long = Long.MaxValue): DataFrame = {
    // Per-row distinct shingle-hash set (codegen kernel): the posting
    // frame is ONE zero-shuffle projection — the set-building distinct
    // shuffle and the per-doc set-size aggregate+join of the purely
    // relational form both collapse into it. Set sizes ride along as the
    // array length, so no size joins are needed after the posting join.
    // One explicit shuffle ON THE JOIN KEY (the inverted-index
    // distribution): both self-join sides read the same cached,
    // sh-partitioned frame, so join parallelism is independent of the
    // input's split count (the fixture parquet is a single row group — a
    // fully narrow pipeline would serialize the join onto one task).
    // Caveat learned in r04: the checkpoint's LogicalRDD loses its
    // partitioning DECLARATION under self-join attribute dedup, so a
    // sort-merge regime re-exchanges the cached blocks (one extra
    // exchange of ids+hashes, not a recompute); in the broadcast regime
    // the stream side reads the blocks exchange-free. This still
    // replaces the relational form's three pre-join shuffles
    // (distinct, set sizes, size join). */
    // eager keyed cut, not persist(): same cached-both-sides self-join,
    // blocks released by the ContextCleaner when this frame goes out of
    // scope — persist() here leaked storage for the session lifetime.
    // byKeysCut (round 16) also puts the sh-partitioning DECLARATION
    // back on the checkpoint (under AQE, Dataset.localCheckpoint erases
    // it — the r04 caveat below was really this) and pre-sorts within
    // partitions, so the sort-merge self-join regime consumes both
    // sides exchange-free AND sort-free.
    val posting = Dist.byKeysCut(
      df.select(id.as("doc_id"),
          graft.plans.TextExpressions.shingleHashSet(text, shingleSize).as("__hs"))
        .select(col("doc_id"), size(col("__hs")).cast("long").as("n_sh"),
          explode(col("__hs")).as("sh")),
      "sh")
    val filtered =
      if (maxDf == Long.MaxValue) posting
      else {
        val dfreq = posting.groupBy("sh").count().filter(col("count") <= maxDf).drop("count")
        posting.join(dfreq, "sh")
      }
    filtered.as("a")
      .join(filtered.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      .agg(count(lit(1)).as("n_inter"))
      .withColumn("jaccard",
        r4(col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter"))))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Exact shingle-set CONTAINMENT join — the ASYMMETRIC sibling of
    * [[jaccardPairs]]: all DIRECTED pairs (src, dst) with
    * C(src→dst) = |S(src) ∩ S(dst)| / |S(src)| ≥ threshold. Containment
    * is what quote/excerpt/benchmark-leak detection actually needs — a
    * short doc fully quoted inside a long one scores C≈1 while its
    * Jaccard is tiny (the size union in the denominator buries it).
    *
    * Scale shape: identical to [[jaccardPairs]] — same zero-shuffle
    * hash-set posting frame, same single inverted-index self-join with
    * the `<` ordering (candidate mass is NOT doubled: both directions
    * are derived from the one undirected intersection count by
    * normalizing against each side's own set size). `maxDf` is the same
    * stop-shingle skew guard. */
  def containmentPairs(df: DataFrame, text: Column, id: Column, threshold: Double,
      shingleSize: Int = 3, maxDf: Long = Long.MaxValue): DataFrame = {
    // keyed cut with the sh-partitioning declared + pre-sorted (round 16,
    // same move as jaccardPairs above)
    val posting = Dist.byKeysCut(
      df.select(id.as("doc_id"),
          graft.plans.TextExpressions.shingleHashSet(text, shingleSize).as("__hs"))
        .select(col("doc_id"), size(col("__hs")).cast("long").as("n_sh"),
          explode(col("__hs")).as("sh")),
      "sh")
    val filtered =
      if (maxDf == Long.MaxValue) posting
      else {
        val dfreq = posting.groupBy("sh").count().filter(col("count") <= maxDf).drop("count")
        posting.join(dfreq, "sh")
      }
    // both directions in ONE explode projection over the aggregated pair
    // frame — a unionAll of two selects re-runs the posting join +
    // intersection aggregate per branch (ReusedExchange shares the
    // shuffle files, not the join/agg work: measured 15× vs jaccard's 5×
    // at the ×10 probe before this form)
    filtered.as("a")
      .join(filtered.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      .agg(count(lit(1)).as("n_inter"))
      .select(explode(array(
        struct(col("a_id").as("src_id"), col("b_id").as("dst_id"),
          r4(col("n_inter").cast("double") / col("n_a")).as("containment")),
        struct(col("b_id").as("src_id"), col("a_id").as("dst_id"),
          r4(col("n_inter").cast("double") / col("n_b")).as("containment")))).as("p"))
      .select(col("p.src_id").as("src_id"), col("p.dst_id").as("dst_id"),
        col("p.containment").as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Span-level exact dedup (the C4/RefinedWeb "remove repeated
    * boilerplate" pass): tile every document into consecutive
    * `tileTokens`-token spans, keep each distinct span's FIRST corpus
    * occurrence (min (doc_id, tile_idx)), and reassemble documents from
    * their surviving tiles. Unlike document-level [[exact]], this strips
    * the shared span from the 99 later copies while keeping the rest of
    * each document.
    *
    * Scale shape: tiling is a narrow HOF pass (sequence → slice →
    * array_join — no explode of corpus token mass); winner election
    * shuffles (16-byte digest, doc_id, tile_idx) — NEVER span text; the
    * keep-set folds back to one row per doc (sorted int array) and the
    * final reassembly re-derives surviving span text narrowly from the
    * doc's own token array. The only text-bearing movement is the output
    * sort itself.
    *
    * Returns (doc_id, n_tiles, n_kept, dedup_text) for every input doc
    * (fully-duplicated docs survive with empty text). */
  /** Repeated-phrase boilerplate report (round 10; the CCNet/RefinedWeb
    * common-line signal at phrase granularity): an `n`-gram occurring in
    * ≥ `minDocs` DISTINCT docs is boilerplate; per doc emit (n_grams,
    * n_boiler, r4 boiler_frac). The common set is computed on the
    * DISTINCT (doc, gram) projection, so a phrase spammed inside one
    * doc never qualifies (that is `text_repetition`'s business). Docs
    * shorter than n tokens are excluded. Gram-co-keyed joins only —
    * vocabulary-sized sides, never corpus×corpus. */
  def boilerplatePhrases(df: DataFrame, text: Column, id: Column,
      n: Int = 5, minDocs: Int = 3): DataFrame = {
    import graft.functions.{Num, TextOps}
    val docs = df.select(id.as("doc_id"), TextOps.tokens(text).as("t"))
      .filter(size(col("t")) >= n)
    val gramArr = expr(s"transform(sequence(1, size(t) - ${n - 1}), " +
      s"i -> array_join(slice(t, i, $n), ' '))")
    val grams = docs.select(col("doc_id"), explode(gramArr).as("gram"))
    // within-doc dedup is ROW-LOCAL (round 15): array_distinct before
    // the explode gives each (doc, gram) pair exactly once, so the
    // document-frequency count needs ONE gram-keyed exchange — the old
    // distinct() paid a full (doc, gram) exchange over the gram stream
    // first and a second gram-keyed one after
    val common = docs.select(explode(array_distinct(gramArr)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs).select("gram")
    val boiler = grams.join(common, Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_boiler"))
    docs.select(col("doc_id"), (size(col("t")) - (n - 1)).cast("long").as("n_grams"))
      .join(boiler, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        Num.r4(col("n_boiler").cast("double") / col("n_grams")).as("boiler_frac"))
  }

  def spanDedup(df: DataFrame, text: Column, id: Column,
      tileTokens: Int = 10): DataFrame = {
    require(tileTokens > 0)
    val w = lit(tileTokens)
    val toks = df.select(id.as("doc_id"), TextOps.tokens(text).as("ts"))
    val nTiles = ceil(size(col("ts")) / w.cast("double")).cast("int")
    val tileAt = (i: Column) => array_join(slice(col("ts"), i * w + 1, w), " ")

    // nTiles == 0 guard (ADVICE r8): sequence(0, -1) yields a DESCENDING
    // [0, -1] and tileAt(-1) would slice from the END of the token
    // array — silently wrong tiles. Unreachable only because split()
    // never returns an empty array today; the guard (same as shingles())
    // keeps the invariant out of the tokenizer's hands.
    val tiles = toks.select(col("doc_id"),
      posexplode(when(nTiles < 1, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), nTiles - 1), tileAt))))
      .toDF("doc_id", "tile_idx", "tile_text")

    val winners = tiles
      .select(md5(col("tile_text")).as("digest"), col("doc_id"), col("tile_idx"))
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("digest")).orderBy(col("doc_id"), col("tile_idx"))))
      .filter(col("rn") === 1)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("tile_idx"))).as("keep_idx"),
        count(lit(1)).cast("int").as("n_kept"))

    toks.join(winners, Seq("doc_id"), "left")
      .select(col("doc_id"),
        nTiles.as("n_tiles"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(array_join(transform(col("keep_idx"), tileAt), " "), lit(""))
          .as("dedup_text"))
  }

  /** Character-level near-dup pairs by bounded edit distance — the
    * record-linkage complement to the token-set families: catches typo /
    * OCR / small-patch variants whose token sets already diverge
    * (Jaccard blind) but whose character streams differ by a few edits.
    *
    * Standard blocking discipline: candidates must share the
    * `prefixLen`-char prefix AND sit within `maxLenDiff` characters of
    * length (any edit-distance-k pair differs ≤ k in length, so
    * maxLenDiff ≥ maxDist loses nothing; smaller trades recall for
    * cost, declared in the contract). Blocks larger than `maxBlock`
    * docs are dropped whole — the boilerplate-prefix hot-block guard,
    * the `maxDf` analog, part of the contract and oracle-mirrored.
    * Survivors are verified with the THRESHOLDED Levenshtein — the
    * custom banded code-point kernel
    * ([[graft.plans.TextExpressions.levenshteinWithin]], value-identical
    * to Spark's `levenshtein(a, b, maxDist)` but ~11× faster on close
    * pairs: the builtin re-compares multi-byte UTF-8 runs per DP cell,
    * the kernel decodes once and runs a primitive-int band). It returns
    * −1 past the cutoff, which the filter drops. The ×10 probe measured
    * the builtin at 91 s on the step this corpus takes at ~sf1 (95% of
    * blocked candidates are true near-dups, so the DP work is the
    * irreducible mass); the kernel returns the op to pair-join cost.
    *
    * Scale shape: one shuffle keys (doc_id, text, len) by the block
    * prefix; the localCheckpoint feeds BOTH self-join sides from one
    * materialization; per-block pair work is ≤ C(maxBlock, 2) by the
    * guard. Emits (a, b, dist), a < b by id. */
  def editDistancePairs(df: DataFrame, text: Column, id: Column,
      prefixLen: Int = 16, maxLenDiff: Int = 10, maxDist: Int = 20,
      maxBlock: Long = 1000L): DataFrame = {
    val d = df.select(id.as("doc_id"), text.as("txt"),
      length(text).as("len"), substring(text, 1, prefixLen).as("pfx"))
    val small = d.groupBy("pfx").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBlock).select("pfx")
    val blocked = d.join(small, Seq("pfx"), "left_semi").localCheckpoint(true)
    // The DP runs behind a Generate barrier (explode of a 1-element
    // array): with a plain projection, PushDownPredicates inlines the
    // `dist >= 0` filter into the JOIN CONDITION as its first conjunct —
    // the banded DP then runs on every pfx-equal pair BEFORE the cheap
    // id-order/length cuts, and again in the projection (measured 2.5×
    // the whole op at the ×10 probe). Predicates referencing generator
    // output cannot cross the Generate, so the kernel runs exactly once
    // per surviving candidate, after all cheap conjuncts.
    blocked.as("x").join(blocked.as("y"),
        col("x.pfx") === col("y.pfx") && col("x.doc_id") < col("y.doc_id") &&
          abs(col("x.len") - col("y.len")) <= maxLenDiff)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        explode(array(graft.plans.TextExpressions.levenshteinWithin(
          col("x.txt"), col("y.txt"), maxDist))).as("dist"))
      .filter(col("dist") >= 0)
  }
}

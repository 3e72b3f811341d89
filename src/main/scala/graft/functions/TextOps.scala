package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Num.r4

/** Text-analysis primitives for the LLM-data-pipeline surface
  * (SURVEY.md §2.11 + driver north star): tokenization, shingling,
  * token counting, quality scoring, SimHash, rolling-hash fingerprints.
  *
  * Everything is a per-row codegen'd expression (split / HOFs / xxhash64)
  * — no shuffle, no UDF, linear scans that vectorize at 100 TB. Hash
  * family is `xxhash64` with constant salts: deterministic across runs,
  * executors, and rounds (no RNG anywhere, SURVEY.md §7.5.2).
  */
object TextOps {

  /** Whitespace tokens, lowercased. The fixture's `text` is single-space
    * separated; `\s+` keeps it robust to real-world whitespace. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Word n-gram shingles: sliding windows of `n` tokens joined by one
    * space. Empty when the doc has fewer than n tokens. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val m = size(toks) - (n - 1)
    // guard: sequence(1, 0) would generate a DESCENDING [1, 0] in Spark —
    // short docs must yield an empty shingle array instead
    when(m < 1, array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)))
      .otherwise(transform(
        sequence(lit(1), greatest(m, lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Per-row n-gram repetition statistics: `struct(max_c, dup_c)` where
    * `max_c` is the count of the most frequent gram and `dup_c` the total
    * occurrences of grams appearing more than once. Sorts the gram array
    * (any total order works) so equal grams are adjacent, then one
    * run-length fold via the `aggregate` HOF — the accumulator carries
    * (prev gram, current run, best run, duplicated mass) and the null
    * initial `prev` makes the first element open a run through the
    * `otherwise` branch without a sentinel value.
    *
    * This replaces a corpus-wide `groupBy(doc_id, gram_n, gram)` — the
    * statistic is per-document, so shuffling every gram string across the
    * cluster only to collapse it back per doc is pure waste. Per-row cost
    * is O(g log g) in the doc's gram count, memory bounded by the longest
    * document, zero shuffle, whole-stage codegen throughout. */
  def repetitionStats(grams: Column): Column = {
    val sorted = array_sort(grams)
    val init = struct(
      lit(null).cast("string").as("prev"), lit(0L).as("run"),
      lit(0L).as("maxc"), lit(0L).as("dupc"))
    def closeMax(acc: Column) = greatest(acc("maxc"), acc("run"))
    def closeDup(acc: Column) =
      acc("dupc") + when(acc("run") > 1, acc("run")).otherwise(lit(0L))
    aggregate(sorted, init,
      (acc, x) => {
        val same = x === acc("prev") // null prev → null → otherwise
        struct(
          x.as("prev"),
          when(same, acc("run") + lit(1L)).otherwise(lit(1L)).as("run"),
          when(same, acc("maxc")).otherwise(closeMax(acc)).as("maxc"),
          when(same, acc("dupc")).otherwise(closeDup(acc)).as("dupc"))
      },
      acc => struct(closeMax(acc).as("max_c"), closeDup(acc).as("dup_c")))
  }

  /** Regex token count — a BPE-ish approximation: alphabetic runs, digit
    * runs, and lone non-space symbols each count as one token. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Heuristic quality score in (0,1): rational in token count and mean
    * token length — deliberately free of transcendentals so any SQL oracle
    * reproduces it bit-for-bit (SURVEY.md §7.4.2). */
  def qualityScore(text: Column): Column = {
    val nTok = size(tokens(text)).cast("double")
    val nChar = length(text).cast("double")
    val meanLen = (nChar - (nTok - 1)) / nTok
    val lenScore = nTok / (nTok + lit(50.0))
    val wordScore = lit(1.0) - abs(meanLen - lit(6.0)) / (abs(meanLen - lit(6.0)) + lit(10.0))
    r4(lenScore * wordScore)
  }

  /** 64-bit SimHash over token hashes: per bit, sum +1/-1 votes from each
    * token's xxhash64 bit, then take the sign. Pure HOF fold over a
    * 64-long accumulator array — per-row, shuffle-free. */
  def simhash64(text: Column): Column = {
    val votes = aggregate(
      tokens(text),
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        val bits = array((0 until 64).map(i =>
          when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))): _*)
        zip_with(acc, bits, (a, b) => a + b)
      })
    val bitValues = array((0 until 64).map(i => lit(1L << i)): _*)
    aggregate(
      zip_with(votes, bitValues, (v, bit) => when(v > 0, bit).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03 — public
    * algorithm): rolling xxhash64 over char k-grams, then the minimum of
    * each w-window, deduplicated. Returns the sorted distinct fingerprint
    * array.
    *
    * REFERENCE form only — interpreted HOFs have no common-subexpression
    * elimination, so the `hashes` transform re-evaluates once per window
    * position: O(len²) hash evaluations per row. Production queries use
    * the per-row codegen kernel
    * ([[graft.plans.TextExpressions.winnowFingerprints]]), which this
    * form exists to cross-check (TextKernelsSpec, PropertySpec). */
  def fingerprints(text: Column, k: Int = 8, w: Int = 4): Column = {
    val n = length(text)
    val hashes = transform(
      sequence(lit(1), greatest(n - (k - 1), lit(1))),
      i => xxhash64(lower(text).substr(i, lit(k))))
    val mins = transform(
      sequence(lit(1), greatest(size(hashes) - (w - 1), lit(1))),
      j => array_min(slice(hashes, j, lit(w))))
    array_sort(array_distinct(mins))
  }

  /** Character n-grams (for language-ID profiles). Per-row HOF form; for
    * corpus-scale extraction prefer [[charNgramRows]] (codegen). */
  def charNgrams(text: Column, n: Int): Column = {
    val t = lower(text)
    transform(
      sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
      i => t.substr(i, lit(n)))
  }

  // --- DataFrame-level extraction (whole-stage-codegen'd) -------------------
  //
  // Higher-order functions (transform/aggregate/zip_with) evaluate
  // INTERPRETED in Spark — measured ~10× slower than the equivalent
  // explode + element_at/substr pipeline, which stays inside
  // WholeStageCodegen. Corpus-scale operators (dedup, langid) use these.

  /** One row per word `n`-gram shingle: (doc_id, sh STRING). Docs with
    * fewer than n tokens emit no rows. Duplicate shingles are kept —
    * callers `distinct()` when they need the set. */
  def shingleRows(df: org.apache.spark.sql.DataFrame, text: Column, id: Column, n: Int): org.apache.spark.sql.DataFrame = {
    val toks = df.select(id.as("doc_id"), split(lower(text), "\\s+").as("__t"))
      .filter(size(col("__t")) >= n)
    toks
      .select(col("doc_id"), col("__t"),
        explode(sequence(lit(1), size(col("__t")) - (n - 1))).as("__i"))
      .select(col("doc_id"),
        concat_ws(" ", (0 until n).map(j => element_at(col("__t"), col("__i") + j)): _*).as("sh"))
  }

  /** One row per character `n`-gram: (doc_id, gram STRING). */
  def charNgramRows(df: org.apache.spark.sql.DataFrame, text: Column, id: Column, n: Int): org.apache.spark.sql.DataFrame = {
    val s = df.select(id.as("doc_id"), lower(text).as("__s"))
      .filter(length(col("__s")) >= n)
    s.select(col("doc_id"), col("__s"),
        explode(sequence(lit(1), length(col("__s")) - (n - 1))).as("__i"))
      .select(col("doc_id"), col("__s").substr(col("__i"), lit(n)).as("gram"))
  }

  /** URL canonicalization for web-corpus dedup: lowercase the
    * scheme://host prefix, drop a `:443` default port, strip `utm_*`
    * tracking params and a trailing slash. A pure codegen'd
    * string-function chain (no UDF); every replacement is literal (no
    * group backreferences), so the identical chain runs in any
    * RE2/Java-regex engine — the DuckDB oracle applies the same steps. */
  def canonicalizeUrl(u: Column): Column = {
    val hostLower = concat(
      lower(regexp_extract(u, "^([^/]+://[^/]+)", 1)),
      regexp_replace(u, "^[^/]+://[^/]+", ""))
    val noPort = regexp_replace(hostLower, ":443/", "/")
    // split at the FIRST '?' only: a literal '&' (or later '?') in the
    // PATH is legal and must survive untouched — rewriting all '?' to
    // '&' and restoring the first '&' would turn the query-less
    // 'a.com/x&y' into 'a.com/x?y', merging it with a distinct URL
    val qpos = instr(noPort, "?")
    val path = when(qpos > 0, noPort.substr(lit(1), qpos - 1)).otherwise(noPort)
    // utm stripping is confined to the query substring; the '&' sentinel
    // prefix lets one literal pattern match leading and inner params
    val query = when(qpos > 0, noPort.substr(qpos + 1, length(noPort))).otherwise(lit(""))
    val qNoUtm = regexp_replace(
      regexp_replace(concat(lit("&"), query), "&utm_[a-z]+=[^&]*", ""), "^&", "")
    val restored = when(qpos > 0 && length(qNoUtm) > 0,
        concat(path, lit("?"), qNoUtm))
      .otherwise(path)
    regexp_replace(restored, "/$", "")
  }

  /** [[canonicalizeUrl]] plus query-PARAM-ORDER normalization: the query
    * substring of the canonical form is split on '&', byte-order sorted,
    * and rejoined — `?b=2&a=1` and `?a=1&b=2` collapse to one canonical
    * URL (real crawls serve both orders for the same resource). Applied
    * AFTER the full canonical chain so utm stripping and the trailing-
    * slash rule see the URL exactly as [[canonicalizeUrl]] does; still a
    * pure codegen'd chain (split/sort/join are builtins), and byte-order
    * string sort is engine-portable. */
  def canonicalizeUrlSorted(u: Column): Column =
    sortUrlParams(canonicalizeUrl(u))

  /** The param-order-sort step alone, over an ALREADY-canonical URL.
    * References its input FOUR times — when `c` is the full
    * [[canonicalizeUrl]] chain inline (as [[canonicalizeUrlSorted]]
    * composes it), `array_sort`'s codegen fallback drops the projection
    * out of whole-stage codegen, losing subexpression elimination, and
    * the ~20-regex chain evaluates 4× per row interpreted (measured 12×
    * the plain-canonical query at sf0.1). At scale, stage instead:
    * compute the canonical form in its OWN projection and feed this the
    * resulting attribute — CollapseProject keeps a non-cheap multi-
    * referenced alias un-inlined, so the chain runs once per row. */
  def sortUrlParams(c: Column): Column = {
    val qpos = instr(c, "?")
    when(qpos > 0,
        concat(c.substr(lit(1), qpos - 1), lit("?"),
          array_join(array_sort(split(c.substr(qpos + 1, length(c)), "&")), "&")))
      .otherwise(c)
  }
}

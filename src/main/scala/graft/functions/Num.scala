package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-reproducible numeric helpers.
  *
  * `r4` replaces `round(x, 4)` for every double the oracle compares:
  * Spark's `round` converts through the double's *shortest decimal
  * representation* (BigDecimal.valueOf → Double.toString) while DuckDB
  * rounds the *exact binary* value — they disagree on half-way doubles
  * (observed: 86684.10495 → 86684.105 vs 86684.1049). `floor(x·10⁴+0.5)/10⁴`
  * is pure IEEE-double arithmetic, bit-identical in any engine; the oracle
  * SQL uses the same formula (SURVEY.md §7.4.2).
  */
object Num {

  /** Half-up-toward-+inf 4-decimal rounding, bit-reproducible across
    * engines. floor of a double fits LONG for |x| < 9e14, far above any
    * fixture aggregate. */
  def r4(c: Column): Column = floor(c * 10000 + 0.5) / lit(10000.0)

  /** The same formula as oracle-SQL text. */
  def r4Sql(inner: String): String = s"floor(($inner) * 10000 + 0.5) / 10000"

  /** 8-decimal variant for quantities that are O(1/N) of a large N —
    * PageRank ranks, probabilities. r4's 1e-4 grid quantizes such
    * values to ZERO once N passes ~10⁴ (caught live: every sf0.1
    * pagerank rank rounded to 0.0); the 1e-8 grid carries N up to ~10⁷
    * with ≥10 signal steps. Same half-up floor form, same cross-engine
    * bit-reproducibility. */
  def r8(c: Column): Column = floor(c * 100000000L + 0.5) / lit(100000000.0)

  def r8Sql(inner: String): String =
    s"floor(($inner) * 100000000 + 0.5) / 100000000"
}

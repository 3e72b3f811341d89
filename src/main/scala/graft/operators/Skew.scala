package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join (SURVEY.md §7.5.4; prompt scale
  * checklist).
  *
  * A hot key (one user with 10⁹ events, one spam document hash) serializes
  * an entire shuffle partition onto one task. AQE's skew-join splitting
  * (on by default in Engine) handles sort-merge joins; this explicit salt
  * is the portable variant for the cases AQE can't re-plan — e.g. a
  * skewed *aggregation* or a broadcast-ineligible dimension:
  *
  *  - big side: append `salt = pmod(xxhash64(monotonic row id), n)`;
  *  - small side: explode each row into n copies, one per salt value;
  *  - join on (key, salt) — the hot key now spreads over n tasks.
  *
  * Deterministic (hash of the row id, no RNG). Result set equals the
  * unsalted join; SkewSpec asserts it.
  */
object Skew {

  /** Salted inner equi-join of `big` (skewed) against `small`. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      salts: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(bigKey), monotonically_increasing_id()), lit(salts.toLong)))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) && saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * then final on key — the manual map-side-combine for aggregates whose
    * partial form the caller supplies (sum/count/min/max shapes). */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int = 8): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy("key")
      .agg(sum("__partial").as("sum_value"))
}

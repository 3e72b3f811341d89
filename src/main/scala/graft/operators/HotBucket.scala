package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency guard for LSH bucket self-joins — the one skew case of the
  * banded dedup/similarity family (SURVEY.md §2.11).
  *
  * A bucket of b colliding rows contributes b·(b−1)/2 candidate pairs;
  * one viral duplicate replicated millions of times at 100 TB turns its
  * bucket quadratic while every other bucket stays tiny. The guard caps
  * that: buckets at or under `maxBucket` keep the exact all-pairs
  * self-join; buckets over it contribute a STAR — every member paired
  * with the bucket's minimum id (b−1 pairs, linear).
  *
  * Why a star is the right cap for dedup: the downstream consumers are
  * (a) pair verification + connected components (semantic dedup), where
  * the star keeps the bucket connected through its minimum — an
  * all-identical spam bucket still collapses to ONE cluster, through
  * b−1 verified pairs instead of b²/2 — and (b) candidate counting,
  * where a hot bucket is almost always one duplicate family, so the
  * star pairs carry the same information. The trade: genuinely distinct
  * near-dup pairs that meet ONLY inside a hot bucket and don't share
  * the hub are not emitted (they usually re-meet in another band —
  * banding exists to give every pair `bands` chances). Default
  * `maxBucket` is far above any healthy bucket population, so the guard
  * is inert until real skew shows up.
  *
  * Shape: bucket sizes come from ONE window over the bucket key — the
  * caller's frame is already hash-distributed on that key, so the count
  * adds a local sort, never an exchange; the split into cold/hot is two
  * narrow filters over it, and the hot side's min-id hub is a bucket-key
  * aggregate on the same partitioning.
  */
object HotBucket {

  /** Inert on healthy data by construction: orders of magnitude above any
    * expected bucket population, small enough that a viral bucket's
    * quadratic blowup is capped at ~10⁸ comparisons instead of 10¹². */
  val defaultMaxBucket = 10000

  /** Distinct candidate pairs (a_id < b_id) from a bucketed frame —
    * all-pairs within buckets sized ≤ `maxBucket`, star-to-minimum within
    * larger ones.
    *
    * The frame is distributed on the bucket key HERE (explicitly —
    * [[Dist.byKeys]]), the count window runs once on that partitioning,
    * and the counted frame is checkpointed before the branches read it.
    * Order matters: a window ABOVE a checkpoint would make
    * EnsureRequirements insert a fresh exchange (the checkpoint drops its
    * partitioning declaration under self-join attribute dedup), and AQE
    * coalesces that tiny exchange to ONE partition — serializing the
    * whole candidate join onto one task (the r03 `sim_knn_graph`
    * regression). With the window folded below the checkpoint, every
    * branch — including the self-join's stream side, which has no
    * distribution requirement — runs at the checkpoint's own partition
    * count, exchange-free. */
  def guardedSelfJoinPairs(banded: DataFrame, bucketCols: Seq[String],
      idCol: String, maxBucket: Int = defaultMaxBucket): DataFrame = {
    require(maxBucket >= 1, "maxBucket must be positive")
    val w = Window.partitionBy(bucketCols.map(col): _*)
    val counted = Dist.byKeys(banded, bucketCols.map(col): _*)
      .withColumn("__n", count(lit(1)).over(w))
      // eager localCheckpoint: computed once, read by four branches; blocks
      // are ContextCleaner-reclaimed when the frame goes out of scope
      .localCheckpoint(true)
    val cold = counted.filter(col("__n") <= maxBucket).drop("__n")
    val hot = counted.filter(col("__n") > maxBucket).drop("__n")
    val joinCond = bucketCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col(s"a.$idCol") < col(s"b.$idCol")
    val coldPairs = cold.as("a").join(cold.as("b"), joinCond)
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"))
    val hotPairs = hot
      .join(hot.groupBy(bucketCols.map(col): _*).agg(min(col(idCol)).as("__m")),
        bucketCols)
      .filter(col(idCol) > col("__m"))
      .select(col("__m").as("a_id"), col(idCol).as("b_id"))
    coldPairs.unionAll(hotPairs).distinct()
  }
}

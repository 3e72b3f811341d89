package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right observation with
  * `right.time <= left.time`, matched on equi keys.
  *
  * Implementation is the **union-sort trick**, not a range join:
  * tag each side, union, then one window pass per key ordered by
  * (time, side) carrying the last-seen right payload forward as ONE
  * struct (`last(struct, ignoreNulls = true)` over an
  * unbounded-preceding ROWS frame — the struct is NULL only on
  * left-side filler rows, so a right row's genuinely NULL payload
  * fields survive and fields never mix across right rows).
  *
  * Scale rationale: a range join is O(|L|·|R|) per key and needs a
  * broadcast or BNLJ; the union trick is one shuffle on the equi key plus
  * a per-partition sort — O((|L|+|R|) log) and embarrassingly parallel
  * across keys, which is what survives 100 TB. Right rows at exactly the
  * left timestamp are included (<=) because side orders right (0) before
  * left (1) at equal times.
  */
object AsOfJoin {

  /** @param payload right-side columns to carry (must not collide with left
    *                column names); all other right columns are dropped.
    * @param rightTieBreak optional right-side column ordering ties on
    *                (keys, time): with multiple right rows at the same
    *                as-of instant, the row greatest under this column wins
    *                — without it, tie winners are partition-order-
    *                dependent (fine when the payload IS the time, as in
    *                the oracle query; pass a unique id otherwise).
    * @param direction "backward" (default; latest right with
    *                rt <= lt — the pandas merge_asof default) or
    *                "forward" (earliest right with rt >= lt): the union-
    *                sort trick is direction-symmetric — forward is the
    *                same one-pass carry over the time order REVERSED, so
    *                both directions cost the identical single shuffle +
    *                per-partition sort.
    */
  /** Shared side-tagging union for the carry tricks: left rows get
    * `__side=1` and a NULL payload struct, right rows `__side=0` and
    * their payload as ONE struct (see the struct rationale below),
    * both stacked into left's column shape plus (`__p`,`__side`,`__t`,
    * `__tb`). NULL right times would sort first in the window order and
    * be carried as matches; SQL's `right.time <= left.time` never
    * matches NULL. NULL right KEYS likewise never equi-match in SQL,
    * but Window.partitionBy groups NULL keys together — filter them so
    * a NULL-key left row gets a NULL payload, not a NULL-key right row.
    *
    * The payload is carried as ONE struct, not per-column: per-column
    * last(_, ignoreNulls) cannot distinguish the left-side filler NULL
    * from a genuinely NULL payload VALUE, so a NULL field in the latest
    * right row would be silently replaced by an older row's value —
    * mixing fields from different right rows. The struct is NULL only
    * on filler rows; a real right row's NULL fields survive inside it. */
  private def tagSides(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      rightTieBreak: Option[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightNonNull = keys.foldLeft(right.filter(col(rightTime).isNotNull)) {
      (df, k) => df.filter(col(k).isNotNull)
    }
    val tbType = rightTieBreak.map(tb => right.schema(tb).dataType)
    val pStructType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)))
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__t", col(leftTime))
      .withColumn("__tb", tbType.map(t => lit(null).cast(t)).getOrElse(lit(0)))
      .select((leftCols.map(col) ++ Seq(lit(null).cast(pStructType).as("__p"),
        col("__side"), col("__t"), col("__tb"))): _*)
    val r = rightNonNull
      .withColumn("__side", lit(0))
      .withColumn("__t", col(rightTime))
      .withColumn("__tb", rightTieBreak.map(col).getOrElse(lit(0)))
      .select((leftCols.map(c => if (keys.contains(c)) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(payload.map(col): _*).as("__p"), col("__side"), col("__t"), col("__tb"))): _*)
    l.unionByName(r)
  }

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      rightTieBreak: Option[String] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward", direction)

    val leftCols = left.columns.toSeq

    // forward = the same carry with time reversed; at equal __t the right
    // side (0) still precedes the left row in traversal order, so the
    // boundary instant matches in BOTH directions (<= / >=), and the
    // equal-time tie winner stays the greatest under the tie-break
    val tOrder = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tOrder, col("__tb").asc_nulls_last, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    tagSides(left, right, keys, leftTime, rightTime, payload, rightTieBreak)
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++ payload.map(p => col(s"__c.$p").as(p))): _*)
  }

  /** As-of join, NEAREST direction (pandas merge_asof
    * direction='nearest'): for each left row, the right row minimizing
    * |rt − lt|; an exact tie prefers the backward match, pandas
    * semantics. Among several right rows at the winning instant the
    * backward side keeps the family's greatest-tie-break-wins rule; the
    * forward side resolves toward the SMALLEST tie-break (the first
    * upcoming observation) — both deterministic, both documented here
    * because the two carries share one sort order.
    *
    * Plan shape: the SAME single key-shuffle + per-partition sort as
    * [[asOf]] — the backward carry (`last` over unbounded-preceding)
    * and the forward carry (`first` over unbounded-following) ride the
    * identical window ordering, so Catalyst plans two Window operators
    * over ONE exchange and ONE sort; the nearest pick is a narrow
    * projection comparing the two carried right times. A right row at
    * exactly the left instant sorts into the backward frame (side 0
    * before 1) and wins with gap 0. */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      rightTieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // the right TIME rides inside the carried struct (needed to compare
    // the two candidates' gaps), exactly like asOfTolerance
    val carry = if (payload.contains(rightTime)) payload else payload :+ rightTime
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__tb").asc_nulls_last, col("__side").asc)
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val u = tagSides(left, right, keys, leftTime, rightTime, carry, rightTieBreak)
      .withColumn("__b", last(col("__p"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__p"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
    val bGap = col("__t") - col(s"__b.$rightTime")
    val fGap = col(s"__f.$rightTime") - col("__t")
    val pick = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .when(bGap <= fGap, col("__b"))
      .otherwise(col("__f"))
    u.withColumn("__c", pick)
      .select((leftCols.map(col) ++ payload.map(p => col(s"__c.$p").as(p))): _*)
  }

  /** As-of join with a match-window TOLERANCE (pandas merge_asof's
    * `tolerance`): a carried right row only counts as a match when its
    * time is within `tolerance` of the left time — backward:
    * `lt − rt <= tolerance`, forward: `rt − lt <= tolerance`. Stale
    * state beyond the window yields NULL payloads, exactly like no
    * match at all.
    *
    * Implementation: the right TIME rides inside the carried struct (the
    * as-of carry already pays for the struct — the extra field is 8
    * bytes), and the tolerance check is one narrow post-projection; the
    * plan is the identical single shuffle + sort as [[asOf]]. */
  def asOfTolerance(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tolerance: Long,
      direction: String = "backward",
      rightTieBreak: Option[String] = None): DataFrame = {
    val carry = if (payload.contains(rightTime)) payload else payload :+ rightTime
    val joined = asOf(left, right, keys, leftTime, rightTime, carry,
      rightTieBreak, direction)
    val gap =
      if (direction == "backward") col(leftTime) - col(rightTime)
      else col(rightTime) - col(leftTime)
    // materialize the verdict BEFORE masking: if rightTime is itself a
    // payload column, masking it first would corrupt the check the other
    // columns' masks still need
    val withOk = joined.withColumn("__ok",
      col(rightTime).isNotNull && gap <= tolerance)
    val masked = payload.foldLeft(withOk) { (df, p) =>
      df.withColumn(p, when(col("__ok"), col(p)))
    }
    (if (carry == payload) masked else masked.drop(rightTime)).drop("__ok")
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.StructType

/** Native as-of join — the full custom-operator extension surface
  * (SURVEY.md §4.3 route (c)): LogicalPlan node → planner Strategy →
  * physical sort-merge operator.
  *
  * Semantics: for each left row, attach the payload of the latest right
  * row with equal keys and `right.time <= left.time` (ties on
  * (key, time) resolve to the last row in the right sort order). Same
  * contract as [[graft.operators.AsOfJoin.asOf]], which remains the
  * composed-from-built-ins reference; AsOfNativeSpec asserts the two
  * produce identical results.
  *
  * Physical design: both children are hash-clustered on the equi keys and
  * sorted by (keys, time) — EnsureRequirements inserts the exchanges and
  * sorts — then one forward merge pass per partition attaches payloads
  * with O(1) memory (a single carried row).
  *
  * Measured honestly (sf0.1, warm, noop-write action, round 2): 0.50 s
  * native vs 0.85 s isolated / ~0.35 s in-suite for the union-window form
  * — caching the right row's projected (key, time) across left rows
  * (it was re-projected per left row) brought the merge from 0.70 s to
  * 0.50 s. The two forms are now comparable; [[graft.operators.AsOfJoin]]
  * stays the default for its codegen'd WindowExec pipeline, and this
  * operator remains the full route-(c) extension-surface demonstration,
  * oracle-gated and differential-tested.
  */
object AsOfJoinNative {

  /** As-of join two DataFrames. `payload` columns (from `right`) must not
    * collide with `left` column names. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    // registration is check-then-append; synchronize so concurrent callers
    // on one session can't double-register or lose an append
    AsOfJoinStrategy.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    // NULL right times sort first under the natural ascending merge order
    // and would be consumed as "valid" as-of matches — but SQL's
    // `right.time <= left.time` never matches NULL, so drop them up front.
    // NULL right KEYS likewise never equi-match in SQL, while the merge's
    // natural-ordering compare would treat NULL==NULL — drop them too
    // (NULL-key LEFT rows then find no right run and get NULL payload).
    // fresh exprIds on the right side (self-join safety): alias every used col
    val rightNonNullKeys = keys.foldLeft(right.filter(col(rightTime).isNotNull)) {
      (df, k) => df.filter(col(k).isNotNull)
    }
    val rightRenamed = rightNonNullKeys.select(
      (keys.map(k => col(k).as(s"__r_$k")) ++
        Seq(col(rightTime).as("__r_time")) ++
        payload.map(p => col(p).as(s"__r_p_$p"))): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightRenamed.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    val node = AsOfJoinNode(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, s"__r_$k")),
      attr(lPlan, leftTime), attr(rPlan, "__r_time"),
      payload.map(p => attr(rPlan, s"__r_p_$p")))
    payload.foldLeft(DatasetBridge.ofRows(spark, node)) { (df, p) =>
      df.withColumnRenamed(s"__r_p_$p", p)
    }
  }
}

/** Logical node: output = left columns ++ nullable payload columns. */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, p) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, p) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of join. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(a => SortOrder(a, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTime).map(a => SortOrder(a, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(a => SortOrder(a, org.apache.spark.sql.catalyst.expressions.Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyTime: Seq[Expression] = leftKeys :+ leftTime
    val rKeyTime: Seq[Expression] = rightKeys :+ rightTime
    val keyTimeTypes = lKeyTime.map(_.dataType)
    val keyTypes = leftKeys.map(_.dataType)
    val payloadExprs: Seq[Expression] = payload
    val outTypes = output.map(_.dataType).toArray
    val nPayload = payload.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // per-partition (executor-side) generated projections and orderings
      val lktProj = UnsafeProjection.create(lKeyTime, lOut)
      val rktProj = UnsafeProjection.create(rKeyTime, rOut)
      val lkProj = UnsafeProjection.create(leftKeys, lOut)
      val rkProj = UnsafeProjection.create(rightKeys, rOut)
      val pProj = UnsafeProjection.create(payloadExprs, rOut)
      val ktOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTimeTypes)
      val kOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(outTypes)
      val nullPayload = new GenericInternalRow(nPayload)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var lastRightPayload: InternalRow = _
        private var lastRightKey: InternalRow = _
        private var nextRight: InternalRow = if (rIter.hasNext) rIter.next() else null
        // (key, time) of nextRight, projected ONCE per right-side advance —
        // without the cache it was re-projected for every left row that
        // merely peeked at the same right row (the common case: |L| >> |R|
        // advances), which dominated the merge at bench scale
        private var nextRightKt: InternalRow =
          if (nextRight != null) rktProj(nextRight).copy() else null

        private def advanceRight(): Unit = {
          lastRightPayload = pProj(nextRight).copy()
          lastRightKey = rkProj(nextRight).copy()
          if (rIter.hasNext) {
            nextRight = rIter.next()
            nextRightKt = rktProj(nextRight).copy()
          } else { nextRight = null; nextRightKt = null }
        }

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lkt = lktProj(l)
          while (nextRight != null && ktOrd.compare(nextRightKt, lkt) <= 0) advanceRight()
          val p =
            if (lastRightKey != null && kOrd.compare(lastRightKey, lkProj(l)) == 0) lastRightPayload
            else nullPayload
          resultProj(joined(l, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

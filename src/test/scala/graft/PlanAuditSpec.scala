package graft

/** Physical-plan regression tests: the scale properties we audited by hand
  * (pushdown, pruning, broadcast, top-k without full sort) must not decay
  * as queries evolve. */
class PlanAuditSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1_pricing pushes the shipdate filter to the parquet scan") {
    val p = plan("q1_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("scan_parquet reads only the projected columns") {
    val p = plan("scan_parquet")
    assert(p.contains("ReadSchema: struct<r_regionkey:int,r_name:string>"), p)
  }

  test("sink_parquet_partitioned read-back prunes at the partition level") {
    val p = plan("sink_parquet_partitioned")
    assert(p.contains("PartitionFilters: [isnotnull(o_orderstatus"), p)
    // the status predicate must be a directory prune, not a data filter:
    // no pushed parquet filter on the partition column
    assert(!p.contains("PushedFilters: [IsNotNull(o_orderstatus"), p)
  }

  test("topk plans TakeOrderedAndProject, not a global sort") {
    val p = plan("topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("join_bucketed: the sort-merge join consumes bucket partitioning — no Exchange below it") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = SparkEntry.queries("join_bucketed")(spark, sf)
    df.collect() // finalize the adaptive plan
    // plain .collect stops at AQE QueryStage boundaries (their children
    // are Nil) — descend through stages and nested adaptive plans
    def deep(p: SparkPlan): Seq[SparkPlan] = {
      val below = p match {
        case q: QueryStageExec => deep(q.plan)
        case a: AdaptiveSparkPlanExec => deep(a.executedPlan)
        case _ => p.children.flatMap(deep)
      }
      p +: below
    }
    val all = deep(df.queryExecution.executedPlan)
    val smjs = all.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected a sort-merge join:\n${all.head}")
    // the co-location claim: NOTHING under the join re-shuffles — the
    // bucketed scans' partitioning feeds the SMJ directly (at 100 TB
    // this is the write-once-join-many bucketing payoff)
    val shufflesUnderJoin =
      smjs.flatMap(_.children.flatMap(deep)).collect { case e: ShuffleExchangeLike => e }
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join must not re-shuffle its inputs:\n${all.head}")
    // and both inputs really are bucketed scans
    assert(all.head.toString.split("SortMergeJoin").last
      .split("\n").count(_.contains("Bucketed: true")) == 2, all.head.toString)
  }

  test("join_inner broadcasts the filtered dimension tables") {
    val p = plan("join_inner")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("sim_topk_cosine scans the corpus without shuffling it") {
    val p = plan("sim_topk_cosine")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("dot_product_float"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("join_asof_native plans the custom exec") {
    val p = plan("join_asof_native")
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("agg_pivot plans the PivotFirst cascade with no domain-discovery collect") {
    val p = plan("agg_pivot")
    // explicit values ⇒ groupBy(k, pivot) partial+final sum, then a
    // pivotfirst regroup — every shuffle carries group-level partials
    // only. The values-discovery overload would run a separate collect
    // job before planning; explicit values keep planning collect-free.
    assert(p.contains("pivotfirst"), p)
    // ≥2: the partial+final pair must survive; an exact count would break
    // on any Spark/AQE re-plan that changes partial-aggregate placement
    // without a real regression (ADVICE r02)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CollectLimit"), p)
  }

  test("agg_percentiles: refinement join broadcasts; data never rides a sort-merge join") {
    val p = plan("agg_percentiles")
    // histogram + target-bucket refinement: the bucket marks come back
    // as a BROADCAST (bounded by groups × quantiles), so the full-data
    // side is never shuffled for the join; the only sorts are the
    // per-target-bucket window and the 3-row gate ORDER BY
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the full-data histogram must keep its partial+final pair (the
    // map-side combine is what bounds the shuffle to O(buckets) rows)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("join_lateral decorrelates to a window-group-limit, no per-row loop") {
    val p = plan("join_lateral")
    // the correlated ORDER BY+LIMIT lateral must become a group-limit
    // window plan (per-partition heaps), not a per-outer-row re-execution
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("unpivot_long expands rows without any pre-sort shuffle") {
    val p = plan("unpivot_long")
    // Expand (the unpivot operator) runs directly over the scan; the only
    // exchange is the final ORDER BY's range partitioning
    assert(p.contains("Expand"), p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("join_full shuffles both sides (full outer can never broadcast)") {
    val p = plan("join_full")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("join_skew_salted spreads the key across salts, result shape unchanged") {
    val p = plan("join_skew_salted")
    // the salt must be part of the join key (the whole point)
    assert(p.contains("__salt"), p)
  }

  test("sub_correlated is decorrelated to an aggregate + join, not per-row re-execution") {
    val p = plan("sub_correlated")
    assert(p.contains("Join") || p.contains("join"), p)
    // a correlated subquery left in place would appear as a Subquery/
    // InSubquery node re-evaluated per row — decorrelation removes it
    assert(!p.toLowerCase.contains("subquery"), p)
  }

  test("sub_scalar plans the statistic as ONE shared scalar subquery") {
    val p = plan("sub_scalar")
    // the subquery tree renders once under the Filter and once under the
    // scan's pushed data filters, but both carry the SAME subquery id —
    // one execution, its result a literal in the single fact pass
    val ids = "Subquery subquery#(\\d+)".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(ids.size == 1, s"expected one shared scalar subquery, got $ids\n$p")
  }

  test("join_existence plans an ExistenceJoin (probe rows never duplicated)") {
    val p = plan("join_existence")
    assert(p.contains("ExistenceJoin"), p)
    // the orders side is filtered before the join, not after
    assert(p.indexOf("Filter") < p.length && !p.contains("CollectLimit"), p)
  }

  test("agg_histogram's share-of-total window runs over the aggregate, not the input") {
    val p = plan("agg_histogram")
    // Window must appear ABOVE HashAggregate in the tree (post-agg, bounded
    // rows); if it ever ran over raw orders the single partition would be
    // the full table
    val win = p.indexOf("Window")
    val agg = p.indexOf("HashAggregate")
    assert(win >= 0 && agg >= 0 && win < agg, p)
  }

  test("sample_reservoir plans TakeOrderedAndProject (per-partition k-heaps)") {
    val p = plan("sample_reservoir")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort ["), p) // never a full global sort
  }

  test("join_interval_bucketed never plans a nested-loop or cartesian join") {
    val p = plan("join_interval_bucketed")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("schema_retype is one narrow projection over the scan — no join, no aggregate, no UDF") {
    val p = plan("schema_retype")
    assert(!p.contains("Join") && !p.contains("Aggregate") && !p.contains("UDF"), p)
    // the only exchange is the final ORDER BY's range partitioning —
    // the retype ladder itself never shuffles
    assert(p.indexOf("Exchange") == p.lastIndexOf("Exchange"), p)
  }

  test("join_bloom probes with codegen'd might_contain below the semi-join, no UDF") {
    val p = plan("join_bloom")
    val join = p.indexOf("LeftSemi")
    val filt = p.indexOf("might_contain") // Spark's codegen'd bloom probe
    assert(join >= 0, p)
    // tree prints top-down: the filter must sit BELOW the join (fact subtree)
    assert(filt > join, p)
    // the probe must stay inside whole-stage codegen: no boxed ScalaUDF
    // anywhere in the plan
    assert(!p.contains("UDF"), p)
  }

  test("ts_resample never shuffles raw event rows — only bucket partials") {
    val p = plan("ts_resample")
    // both branches (observed sums, grid span) must partial-aggregate
    // map-side BEFORE their exchange: the shuffle moves (key, bucket)
    // partials, never raw events. partial_sum = observed branch;
    // partial_min/max = span branch.
    assert(p.contains("partial_sum"), p)
    assert(p.contains("partial_min"), p)
  }

  test("ts_interpolate: both neighbor carries ride ONE window sort, partials only") {
    val p = plan("ts_interpolate")
    // same shuffle discipline as ts_resample: the exchanges move
    // (key, bucket) partials, never raw events
    assert(p.contains("partial_sum"), p)
    assert(p.contains("partial_min"), p)
    // the backward (last) and forward (first) carries share the
    // (user_id, b) order: exactly one PARTITION-LOCAL sort (`false, 0`)
    // below the windows — a second one would mean the frames diverged.
    // (The query's final total ORDER BY is a global sort, not counted.)
    val winSorts = p.linesIterator.count(l =>
      l.contains("Sort [user_id#") && l.contains("b#") && l.contains("false, 0"))
    assert(winSorts == 1, p)
  }

  test("agg_percentiles contains no buffering percentile aggregate") {
    val p = plan("agg_percentiles")
    // the O(rows-per-group)-buffer built-in must never reappear (VERDICT
    // r03 #3); the plan is the bucketed two-phase form: a window for
    // within-bucket ranks + a broadcast join for the bucket bases
    assert(!p.contains("percentile("), p)
    assert(p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // the Expand of the unpivot is the only row multiplier — no cartesian
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sql_dashboard: the SQL front-end plan prunes to the three used columns") {
    val p = plan("sql_dashboard")
    // SQL text → same Catalyst machinery: scan must read only the
    // referenced columns (pruning reaches the parquet reader through the
    // temp view) and aggregate partial+final
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.split(",").map(_.takeWhile(_ != ':')).toSet ==
      Set("o_orderpriority", "o_totalprice", "o_orderdate"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("dedup_minhash: guarded candidate join stays a bucket equi-join") {
    val p = plan("dedup_minhash")
    // the hot-bucket guard must not degrade the bucket self-join into a
    // nested-loop or cartesian — candidates always meet on bucket keys
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("Dist.byKeys defeats AQE partition coalescing (the r03 sim_knn_graph trap)") {
    // a bare repartition(cols) is an AQE coalesce target: on a small
    // frame AQE collapsed it to ONE partition, serializing the banded
    // LSH self-join onto one task. Dist.byKeys pins the count.
    import spark.implicits._
    val tiny = (1 to 1000).map(i => (i.toLong, i % 7)).toDF("id", "k")
    val pinned = graft.operators.Dist.byKeys(tiny, org.apache.spark.sql.functions.col("k"))
    assert(pinned.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions,
      s"pinned repartition coalesced to ${pinned.rdd.getNumPartitions}")
    // and it plans as REPARTITION_BY_NUM — the AQE-exempt marker. (In the
    // LSH operators the repartition executes inside an eager checkpoint —
    // round 8 extended that to dedup_simhash's band frame too — so the
    // marker is asserted on the pinned frame's own plan.)
    assert(pinned.queryExecution.executedPlan.toString.contains("REPARTITION_BY_NUM"),
      pinned.queryExecution.executedPlan.toString)
  }

  test("search_bm25: heap top-k, broadcast stats/df, query-term filter before the shuffle") {
    val p = plan("search_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p) // df frame broadcast
    assert(p.contains("BroadcastNestedLoopJoin"), p) // 1-row stats cross join
    // the isin prune sits under the postings aggregate, not after it
    assert(p.contains("spark,join,window"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("graph_pagerank plans exactly one contribution shuffle per round plus the sort") {
    val p = plan("graph_pagerank")
    val contrib = p.linesIterator.count(_.contains("Exchange hashpartitioning(node#"))
    val sort = p.linesIterator.count(_.contains("Exchange rangepartitioning"))
    assert(contrib == QueriesAnalytics.graphPagerankIters && sort == 1,
      s"expected ${QueriesAnalytics.graphPagerankIters}+1 exchanges, got $contrib+$sort\n$p")
  }

  test("dedup_spans: winner election ships digests, never span text") {
    val p = plan("dedup_spans")
    assert(p.contains("WindowGroupLimit"), p) // rn=1 pre-limited per partition
    // the md5 digest is computed DIRECTLY below the winner-election
    // shuffle (no exchange between them), so span text never crosses a
    // wire: the exchange carries (digest, doc_id, tile_idx) only
    val exIdx = p.indexOf("Exchange hashpartitioning(digest#")
    val md5Idx = p.indexOf("Project [md5(")
    assert(exIdx >= 0 && md5Idx > exIdx, p)
    assert(!p.substring(exIdx + 1, md5Idx).contains("Exchange"),
      "an exchange sits between the digest projection and the winner shuffle")
  }

  test("sample_temperature_rank broadcasts the target frame; one rank shuffle") {
    val p = plan("sample_temperature_rank")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("sample_temperature (primary = threshold form): no window/sort; fact side never shuffled") {
    val p = plan("sample_temperature")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), "the threshold form must not rank the fact table\n" + p)
    // the only exchanges belong to the tiny target/threshold subtree
    // (per-source counts) and the broadcast itself — the events scan
    // feeds the join directly
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ts_anomaly: moments broadcast back onto the bucket frame, no sort-merge join (round 9)") {
    val p = plan("ts_anomaly")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("pack_shards: bucket-partitioned rank window + tiny bases window, bases broadcast (round 9)") {
    val p = plan("pack_shards")
    assert("Window".r.findAllIn(p).size >= 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("vec_project_rp: pure scan — the only exchange is the output sort (round 9)") {
    val p = plan("vec_project_rp")
    assert(p.contains("dot_product_float"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    // one range-partitioning exchange for the final orderBy, nothing else
    assert("Exchange".r.findAllIn(p).size <= 1, p)
  }

  test("vec_centroids: dim join broadcasts, one hash aggregate after the explode (round 9)") {
    val p = plan("vec_centroids")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dedup_url_params: no join, one count aggregate over a narrow projection (round 9)") {
    val p = plan("dedup_url_params")
    assert(!p.contains("Join"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("isCheapRescan: scans and column-shuffles yes; computed projections and aggregates no") {
    import graft.operators.Checkpointing.isCheapRescan
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    assert(isCheapRescan(docs))
    assert(isCheapRescan(docs.select("doc_id", "text")))
    assert(isCheapRescan(docs.filter(col("doc_id") > 10).select(col("text").as("t"))))
    // a projection that COMPUTES (the incrementalMinhash live-state case,
    // ADVICE r8) must not count as cheap — re-scanning would re-run the work
    assert(!isCheapRescan(docs.select(md5(col("text")).as("d"))))
    assert(!isCheapRescan(
      graft.operators.Dedup.minhashSignatures(docs, col("text"), col("doc_id"))))
    assert(!isCheapRescan(docs.groupBy("source").count()))
    // already-materialized frames are cheap again
    assert(isCheapRescan(docs.groupBy("source").count().localCheckpoint(true)))
  }
}

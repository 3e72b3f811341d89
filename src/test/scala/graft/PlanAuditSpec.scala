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

  test("topk plans TakeOrderedAndProject, not a global sort") {
    val p = plan("topk")
    assert(p.contains("TakeOrderedAndProject"), p)
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
}

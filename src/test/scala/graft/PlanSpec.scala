package graft

import org.apache.spark.sql.functions._

/** Plan-shape regression guards — the ".explain and iterate" discipline
  * encoded as assertions, so a future change that silently drops a
  * broadcast or un-pushes a filter fails CI, not the 100 TB run. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("s1 pushes the quantity filter into the parquet scan") {
    val p = plan("s1_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"), p)
    // pruned read schema: exactly the 4 projected columns
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double>"), p)
  }

  test("j5 star join broadcasts all four dimensions — zero sort-merge joins") {
    val p = plan("j5_star_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).length == 4, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("o1 top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan("o1_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("j6 bounded range join broadcasts the filtered probe side") {
    val p = plan("j6_range")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("a1 aggregation is two-phase (partial before the shuffle)") {
    val p = plan("a1_tpch_q1")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
  }

  test("l2 minhash candidate join is an equi join on the bucket key") {
    val p = plan("l2_minhash_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("only j9 (and the tiny-probe joins) may be nested-loop shaped") {
    // cross join of two dims is fine; nothing fact-sized may be cartesian
    val p = plan("j9_cross")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"), p)
  }
}

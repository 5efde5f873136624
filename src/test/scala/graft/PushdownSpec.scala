package graft

import org.apache.spark.sql.functions._

/** Executable plan evidence for the scan-efficiency claims in SCALE.md:
  * filters reach the parquet scan (`PushedFilters`), projections prune
  * the read schema (`ReadSchema`), and small dimension sides broadcast.
  * These run against real declared queries, not synthetic frames, so a
  * regression in a query's plan shape fails the suite.
  */
class PushdownSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String =
    Queries.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q_filter_eq pushes the equality predicate into the parquet scan") {
    val plan = executedPlan("q_filter_eq")
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(l_returnflag,R)"),
      s"expected pushed l_returnflag filter:\n$plan")
  }

  test("q_scan_limit prunes the read schema to the projected columns") {
    val plan = executedPlan("q_scan_limit")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_returnflag"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      s"scan reads more columns than projected: $readSchema")
  }

  test("q_join_3way broadcasts the dimension sides") {
    val plan = executedPlan("q_join_3way")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins for customer/nation dims:\n$plan")
  }

  test("q_topk compiles to TakeOrderedAndProject (never a full sort)") {
    val plan = executedPlan("q_topk")
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("q_decontaminate broadcasts the benchmark shingle side") {
    val plan = executedPlan("q_decontaminate")
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }

  test("q_filter_range pushes both timestamp bounds to the scan") {
    val plan = executedPlan("q_filter_range")
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
      pushed.contains("LessThan(l_shipdate"), s"pushed: $pushed")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Whole-stage-codegen evidence (round 11): the hot declared paths must
  * actually run inside fused codegen stages — a non-codegen Expression
  * or a fallback-eval operator in the scan→filter→aggregate spine
  * silently costs the iterator-model overhead on every row at 100 TB.
  * Codegen'd operators print with a `*(id)` stage marker in the
  * executed plan; these tests pin the marker onto the operators that
  * matter, so a future Expression whose `doGenCode` breaks (falling
  * back to interpreted eval) fails a spec instead of a benchmark.
  */
class CodegenSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlanString(name: String): String = {
    val df = Queries.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
  }

  private def codegenNodes(plan: String): Seq[String] =
    plan.linesIterator.map(_.trim)
      .filter(_.matches("""[+\-:\s]*\*\(\d+\) .*"""))
      .toSeq

  test("the flagship aggregate runs its scan/filter/agg spine in codegen stages") {
    val plan = executedPlanString("q_agg_multi")
    val starred = codegenNodes(plan)
    assert(starred.exists(_.contains("HashAggregate")),
      s"HashAggregate outside codegen:\n$plan")
    assert(starred.exists(_.contains("Filter")) ||
      !plan.contains(") Filter"), // filter may fold into the scan entirely
      s"Filter outside codegen:\n$plan")
  }

  test("the codegen'd custom VecDot expression stays inside a fused projection") {
    // VecDot alone — NOT wrapped in transform(): Spark's higher-order
    // functions (transform/aggregate lambdas) are CodegenFallback, so
    // any projection containing one falls out of whole-stage codegen
    // no matter what the inner expression supports. The fixed-point
    // cast stage of the real pipelines pays that once per scan; the
    // DOT — the O(dim) hot loop evaluated once per candidate pair —
    // must codegen, which is what this pins.
    import spark.implicits._
    // parquet round-trip: a literal local relation would be constant-
    // folded away (the whole Project collapses into LocalTableScan and
    // there is nothing left to codegen)
    val tmp = java.nio.file.Files.createTempDirectory("vecdot_cg").toString
    Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
        (Array(2L, 0L, 1L), Array(1L, 1L, 1L)))
      .toDF("a", "b").write.mode("overwrite").parquet(s"$tmp/t")
    val df = spark.read.parquet(s"$tmp/t")
      .select(graft.plans.VecDot.dotLong(col("a"), col("b")).as("d"))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 32L))
    val plan = df.queryExecution.executedPlan.toString
    assert(codegenNodes(plan).exists(_.contains("Project")),
      s"VecDot projection fell out of whole-stage codegen:\n$plan")
  }

  test("the fused MinHash signature and hashed-set preps run inside codegen stages") {
    val docs = Tables.documents(spark, dir)
    val sig = graft.operators.DedupOps.minHashSignatures(docs, 12)
    sig.collect()
    val sigPlan = sig.queryExecution.executedPlan.toString
    assert(codegenNodes(sigPlan).exists(_.contains("minhash_sig")),
      s"minhash_sig projection fell out of codegen:\n$sigPlan")
    val hs = docs.select(graft.plans.SortedHashedSet.sortedHashedSet(
      split(col("text"), " ")).as("hs"))
    hs.collect()
    val hsPlan = hs.queryExecution.executedPlan.toString
    assert(codegenNodes(hsPlan).exists(_.contains("sorted_hashed_set")),
      s"sorted_hashed_set projection fell out of codegen:\n$hsPlan")
  }

  test("the fixed-point brute-force search keeps its corpus pass in codegen") {
    val plan = executedPlanString("q_simsearch_fast")
    assert(codegenNodes(plan).nonEmpty,
      s"no codegen stage anywhere in the search plan:\n$plan")
    assert(codegenNodes(plan).exists(l =>
      l.contains("Project") || l.contains("Filter")),
      s"corpus scoring pass outside codegen:\n$plan")
  }
}

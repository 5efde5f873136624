package graft

import graft.sources.StorageOps
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{SparkPlan, FileSourceScanExec}
import org.apache.spark.sql.functions._

/** Plan evidence for the bucketed-layout story: two tables bucketed by
  * the join key into the same bucket count must join with ZERO shuffle
  * on either side — the co-location contract that turns a nightly
  * 100 TB fact⋈fact shuffle into a local per-bucket merge. Broadcast is
  * disabled inside the test so the assert proves CO-LOCATION, not a
  * small-table shortcut.
  */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other                    => other
  }

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    finalPlan(p).collect { case q => q }.flatMap {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
      case q                        => pf.lift(q).toSeq
    }

  test("same-bucket-count tables join with zero Exchange (co-located SMJ)") {
    val orders   = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    StorageOps.writeBucketedTable(orders, "orders_b8", "o_orderkey", 8,
      sortCols = Seq("o_orderkey"))
    StorageOps.writeBucketedTable(lineitem, "lineitem_b8", "l_orderkey", 8,
      sortCols = Seq("l_orderkey"))
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b8")
        .join(spark.table("lineitem_b8"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan
      val exchanges = collectAll(plan) { case e: ShuffleExchangeExec => e }
      // the bucketed join itself is exchange-free; the only permitted
      // shuffle is the group-by ABOVE the join (different key)
      assert(exchanges.size <= 1,
        s"expected at most the post-join agg exchange, got ${exchanges.size}:\n$plan")
      val scans = collectAll(plan) { case s: FileSourceScanExec => s }
      assert(scans.forall(_.bucketedScan),
        s"both sides must read as bucketed scans:\n$plan")
      // cross-check the result against the unbucketed plan
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))
      assert(joined.orderBy("o_orderstatus").collect().toSeq ==
        plain.orderBy("o_orderstatus").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS orders_b8")
      spark.sql("DROP TABLE IF EXISTS lineitem_b8")
    }
  }

  test("bucketed layout writes nBuckets files and survives a round trip") {
    val part = spark.read.parquet(s"$dir/part.parquet")
    StorageOps.writeBucketedTable(part, "part_b4", "p_partkey", 4)
    try {
      val loc = spark.sql("DESCRIBE TABLE EXTENDED part_b4")
        .filter(col("col_name") === "Location")
        .collect()(0).getString(1).stripPrefix("file:")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(loc), spark.sparkContext.hadoopConfiguration)
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(loc))
        .count(_.getPath.getName.endsWith(".parquet"))
      assert(files == 4, s"expected 4 bucket files, got $files")
      assert(spark.table("part_b4").count() == part.count())
    } finally spark.sql("DROP TABLE IF EXISTS part_b4")
  }
}

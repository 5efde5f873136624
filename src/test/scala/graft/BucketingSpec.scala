package graft

import org.apache.spark.sql.functions._

/** Executable evidence for SCALE.md's bucketing claim: co-bucketed
  * tables join without any shuffle exchange, while the plain parquet
  * join needs one per side. This is the 100 TB lever for the recurring
  * o_custkey joins.
  */
class BucketingSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("co-bucketed join runs shuffle-free; unbucketed join shuffles") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)

    // disable auto-broadcast so the join shape is SMJ in both cases and
    // the only difference is the bucketing-induced exchange elimination
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
      orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_bkt")
      customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_bkt")

      val bucketed = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").count()
      val plain = orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").count()

      // same answer either way
      val a = bucketed.orderBy("c_mktsegment").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val b = plain.orderBy("c_mktsegment").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(a == b && a.nonEmpty)

      // the bucketed join's physical plan has no exchange before the join
      // (only the one the final groupBy needs); the plain join has the
      // groupBy exchange PLUS one per join side
      def exchanges(p: String): Int = "Exchange hashpartitioning".r.findAllIn(p).size
      val bktEx = exchanges(planOf(bucketed))
      val plainEx = exchanges(planOf(plain))
      assert(bktEx < plainEx,
        s"bucketed join should shuffle less: bucketed=$bktEx plain=$plainEx")
      assert(bktEx <= 1, s"bucketed join should keep at most the agg exchange, got $bktEx")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** The SQL front door: every table registered as a view, and the same
  * semantics reachable through `spark.sql(...)` as through the
  * DataFrame API — proven by running the flagship Q1-shape and a
  * windowed query both ways and asserting identical results.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("flagship Q1-shape via spark.sql equals the DataFrame plan") {
    Tables.registerViews(spark, dir)
    val sql = spark.sql("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        MIN(l_quantity) AS min_qty,
        MAX(l_extendedprice) AS max_price,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP_NTZ '2000-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
    val df = Queries.qAggMulti(spark, dir)
    assert(sql.collect().toSeq == df.collect().toSeq)
  }

  test("windowed top-3 per customer via spark.sql equals the DataFrame plan") {
    Tables.registerViews(spark, dir)
    val sql = spark.sql("""
      SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders) WHERE rn <= 3
      ORDER BY o_custkey, rn""")
    val df = Queries.queries("q_window_rank")(spark, dir)
    assert(sql.collect().toSeq == df.collect().toSeq)
  }

  test("events view carries normalized epoch-nanos ts (queryable as LONG under any parquet encoding)") {
    Tables.registerViews(spark, dir)
    val n = spark.sql(
      "SELECT COUNT(*) FROM events WHERE ts div 1000 > 0").collect()(0).getLong(0)
    assert(n > 0)
  }
}

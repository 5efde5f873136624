package graft

import org.apache.spark.sql.functions._

/** Write-path capabilities (SURVEY §2.A sinks) with plan evidence:
  * hive-style partitioned parquet + partition pruning on read-back, and
  * PERMISSIVE CSV tolerance for corrupt rows (the pandas-like A2
  * semantics the ETL relies on).
  */
class SinkSpec extends SparkSpec {

  test("partitionBy write → partition-pruned read (plan shows PartitionFilters)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = java.nio.file.Files.createTempDirectory("part_out").toString
    docs.write.partitionBy("lang").mode("overwrite").parquet(s"$out/docs")

    val back = spark.read.parquet(s"$out/docs")
    val en = back.filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition pruning in plan:\n$plan")
    // pruned read returns exactly the partition's rows
    assert(en.count() == docs.filter(col("lang") === "en").count())
    // only the en=... directory is listed once pruned
    val dirs = new java.io.File(s"$out/docs").listFiles().map(_.getName)
      .filter(_.startsWith("lang=")).toSet
    assert(dirs.contains("lang=en") && dirs.size == 5)
  }

  test("PERMISSIVE CSV keeps malformed rows as nulls (pandas-like tolerance)") {
    val dir = java.nio.file.Files.createTempDirectory("csv_in").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"),
      """id,score,name
        |1,1.5,alpha
        |2,not_a_number,beta
        |3,3.5,gamma
        |""".stripMargin)
    val df = spark.read.option("header", true)
      .schema("id INT, score DOUBLE, name STRING")
      .option("mode", "PERMISSIVE").csv(s"$dir/data.csv")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(1).isNullAt(1) && rows(1).getString(2) == "beta")  // coerced, kept
    assert(rows(2).getDouble(1) == 3.5)
  }
}

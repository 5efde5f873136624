package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md /
  * FIXTURES.md §B).
  *
  * Scale notes (100 TB stance): all loaders are plain
  * `spark.read.parquet` — Spark's vectorized parquet reader splits files
  * into `spark.sql.files.maxPartitionBytes`-sized tasks, so the same code
  * path scales from the 6k-row sf0.001 fixture to a multi-TB lake. Filter
  * pushdown and column pruning happen in Catalyst; nothing here
  * materializes on the driver.
  */
object Tables {

  /** Generic table loader: `$dir/$name.parquet`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.parquet` carries a `TIMESTAMP(NANOS)` column, which stock
    * Spark 4 rejects at schema-conversion time (`PARQUET_TYPE_ILLEGAL`).
    * With `spark.sql.legacy.parquet.nanosAsLong=true` the column arrives
    * as `LongType` nanoseconds since the epoch — lossless. Derive
    * timestamp semantics with integer arithmetic (`ts div 1000` → µs for
    * `timestamp_micros`, `ts div 86400000000000` → epoch days), never
    * through a double division, so no precision is lost at 2024-era
    * epoch-nanos magnitudes (~1.7e18).
    *
    * The conf is set at runtime (session-wide, idempotent) because the
    * driver's Verify/Bench build the session without it.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
  }

  /** All table names under a data dir. */
  val Names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so the full engine surface is
    * reachable through `spark.sql(...)` — a user of the reference can
    * drive the same data with raw SQL instead of the DataFrame API. The
    * views are lazy plans over the parquet scans (no materialization);
    * `events` goes through the nanos shim like everywhere else.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n        => table(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Nanoseconds per time unit, for integer-exact event-time math. */
  object Nanos {
    val PerSecond: Long = 1000L * 1000L * 1000L
    val PerMinute: Long = 60L * PerSecond
    val PerHour: Long   = 60L * PerMinute
    val PerDay: Long    = 24L * PerHour
  }
}

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

  /** `events.parquet` ships with whichever parquet timestamp encoding the
    * harness writer last used — `TIMESTAMP(NANOS)` through round 7,
    * `TIMESTAMP(MICROS)` (isAdjustedToUTC=false) from round 8 — and at
    * 100 TB a real lake mixes both, because different writers made
    * different choices. The engine's internal contract is fixed either
    * way: downstream event-time code sees `ts` as `LongType` epoch-NANOS
    * and derives timestamp semantics with integer arithmetic
    * (`ts div 1000` → µs for `timestamp_micros`, `ts div
    * 86400000000000` → epoch days), never a double division, so no
    * precision is lost at 2024-era epoch-nanos magnitudes (~1.7e18).
    * Normalization happens ONCE, here, at the reader boundary:
    *
    *  - `TIMESTAMP(NANOS)` parquet: stock Spark 4 rejects it at
    *    schema-conversion time (`PARQUET_TYPE_ILLEGAL`); with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set idempotently
    *    below — the driver's Verify/Bench build the session without it)
    *    the column arrives as `LongType` nanos, already the contract.
    *  - `TIMESTAMP(MICROS)`/`MILLIS` parquet: the file is RE-READ with
    *    an explicit schema pinning `ts` to TIMESTAMP_LTZ (user-supplied
    *    schemas override both NTZ inference and any writer-embedded
    *    catalyst metadata), under which the vectorized reader surfaces
    *    the RAW parquet micros as the internal value — so
    *    `unix_micros * 1000` recovers the written value exactly,
    *    independent of the session time zone (verified against pyarrow
    *    under a deliberately non-UTC session; exact integer math —
    *    µs-epoch fits a Long ×1000 with ~5 decimal digits to spare).
    *    Deliberately NOT a session-wide
    *    `spark.sql.parquet.inferTimestampNTZ.enabled=false`: that conf
    *    would silently flip OTHER tables' µs columns (o_orderdate,
    *    l_shipdate) from NTZ to LTZ for every read after the first
    *    events read — an order-dependent type surface. The explicit
    *    schema scopes the override to this one column of this one
    *    table. The NTZ arm in [[normalizeTsNanos]] remains for direct
    *    callers holding an already-read NTZ frame (value-preserving
    *    under the UTC-pinned sessions every engine entry point builds).
    *
    * DuckDB (the oracle) reads the µs file as naive TIMESTAMP and
    * `epoch_ns(ts)` yields the same µs-floored nanos, so oracle SQL is
    * unchanged across encodings.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val probe = table(spark, dir, "events")
    probe.schema("ts").dataType match {
      case LongType => probe // TIMESTAMP(NANOS) via the shim: already epoch-nanos
      case TimestampType | TimestampNTZType =>
        val pinned = StructType(probe.schema.map(f =>
          if (f.name == "ts") f.copy(dataType = TimestampType) else f))
        normalizeTsNanos(
          spark.read.schema(pinned).parquet(s"$dir/events.parquet"), "ts")
      case other =>
        throw new IllegalStateException(
          s"ts: unsupported parquet type $other (expected int64 nanos or timestamp)")
    }
  }

  /** Normalize a timestamp-bearing column to the engine contract —
    * `LongType` epoch-nanos — whatever type the parquet reader surfaced.
    * See [[events]] for the encoding-by-encoding reasoning.
    */
  def normalizeTsNanos(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType => df // TIMESTAMP(NANOS) via the shim: already epoch-nanos
      case TimestampType | TimestampNTZType =>
        df.withColumn(colName, unix_micros(col(colName).cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalStateException(
          s"$colName: unsupported parquet type $other (expected int64 nanos or timestamp)")
    }
  }

  /** Events across a MIXED-generation lake: each directory may carry a
    * different parquet timestamp encoding (a 100 TB lake accumulates
    * TIMESTAMP(NANOS) partitions from one writer generation next to
    * TIMESTAMP(MICROS) from another — exactly the drift the harness
    * itself exhibited between rounds 7 and 8). One `spark.read` cannot
    * span them (int64 vs timestamp schemas don't merge), so the unit of
    * encoding uniformity is the directory: read + normalize each, then
    * `unionByName`. Each branch stays an independent pushdown-capable
    * parquet scan — the union is plan-level, not a materialization, so
    * filters on the union still prune per-branch.
    */
  def eventsLake(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    require(dirs.nonEmpty, "eventsLake: at least one directory")
    dirs.map(events(spark, _)).reduce(_.unionByName(_))
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

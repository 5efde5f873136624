package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout management (SURVEY.md §2 A extensions) — the table
  * maintenance a 100 TB lakehouse runs continuously: small-file
  * compaction, schema-evolution reads, and observed row-accounting.
  * All pure Spark (parquet + the DataFrame writer); no table-format
  * dependency, so the same shapes apply under any catalog.
  */
object StorageOps {

  /** Compact a parquet directory toward `targetBytes` output files:
    * the small-files problem is the silent scan killer at scale — a
    * 100 TB table written by 10⁵ streaming micro-batches becomes 10⁸
    * kilobyte files whose open/footer overhead dwarfs the read. File
    * count is sized from the ACTUAL input bytes (not a guessed
    * constant), and `maxRecordsPerFile` is deliberately NOT used —
    * repartition gives size-balanced shuffled splits, which also
    * re-clusters row groups for column-stat pruning.
    *
    * This is the storage-side twin of `spark.sql.files
    * .maxPartitionBytes` (read-side coalescing): reads can merge small
    * files per task, but only a rewrite fixes footer bloat and
    * min/max-stat fragmentation for every FUTURE reader.
    *
    * Returns the compacted frame's file count (post-write, counted
    * from the filesystem — the contract, not the intent).
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long): Int = {
    require(targetBytes > 0)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    val inputBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inDir)).getLength
    val nFiles = math.max(1, math.ceil(inputBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Schema-evolution read: union the schemas of every parquet footer
    * under `dir` (`mergeSchema`) so batches written before a column
    * existed read back with nulls there — the append-only ingest
    * contract (new fields arrive, old data stays immutable).
    * mergeSchema is off by default because footer-merging costs one
    * footer read PER FILE at planning time; at 10⁸ files that is the
    * planning bottleneck, so production tables pin the merged schema
    * in a catalog and this call is the BACKFILL/inspection path.
    */
  def readEvolved(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** Run `df` to a parquet sink while OBSERVING row counts and a null
    * tally on `keyCol` — `Observation` rides the existing job (metrics
    * accumulate on the executors during the write itself), so the
    * accounting costs ZERO extra passes. The always-on audit numbers
    * every production load wants (rows written, keys lost) without the
    * second count() scan that doubles the job.
    */
  def writeCounted(df: DataFrame, keyCol: String, outDir: String): (Long, Long) = {
    val obs = Observation("write_audit")
    df.observe(obs,
        count(lit(1)).as("rows"),
        sum(col(keyCol).isNull.cast("long")).as("null_keys"))
      .write.mode("overwrite").parquet(outDir)
    val m = obs.get
    (m("rows").asInstanceOf[Long],
      Option(m("null_keys")).map(_.asInstanceOf[Long]).getOrElse(0L))
  }
}

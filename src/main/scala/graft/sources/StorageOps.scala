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
    * the explicit repartition gives size-balanced splits.
    *
    * Two layout modes (ADVICE r7): with `sortCols` empty the rewrite
    * is a round-robin `repartition(n)` — size balance only; being
    * round-robin it DESTROYS any pre-existing clustering, so min/max
    * column stats get wider, not tighter. When the table has a hot
    * filter column, pass it in `sortCols`: `repartitionByRange` then
    * range-clusters rows across files so each file covers a narrow
    * key interval and future readers prune whole files on the
    * parquet min/max stats.
    *
    * This is the storage-side twin of `spark.sql.files
    * .maxPartitionBytes` (read-side coalescing): reads can merge small
    * files per task, but only a rewrite fixes footer bloat — and only
    * a SORTED rewrite fixes min/max-stat fragmentation — for every
    * FUTURE reader.
    *
    * Returns the compacted frame's file count (post-write, counted
    * from the filesystem — the contract, not the intent).
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long, sortCols: Seq[String] = Nil): Int = {
    require(targetBytes > 0)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    val inputBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inDir)).getLength
    val nFiles = math.max(1, math.ceil(inputBytes.toDouble / targetBytes).toInt)
    withNanosShim(spark) {
      val src = spark.read.parquet(inDir)
      val laidOut =
        if (sortCols.isEmpty) src.repartition(nFiles)
        else src.repartitionByRange(nFiles, sortCols.map(col): _*)
      laidOut.write.mode("overwrite").parquet(outDir)
    }
    fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Scoped TIMESTAMP(NANOS) read tolerance for the compaction ops:
    * inside `body` the legacy nanosAsLong shim is on, so a ns-encoded
    * parquet reads as LongType instead of throwing at schema
    * conversion — and the previous conf state is restored afterwards,
    * so the shim never leaks into unrelated session reads (an
    * application may rely on the loud PARQUET_TYPE_ILLEGAL).
    *
    * Honest schema contract for ns inputs: Spark cannot WRITE
    * TIMESTAMP(NANOS) at all, so a compacted copy of a ns column
    * carries plain INT64 epoch-nanos — exactly the engine's internal
    * `ts` contract ([[graft.Tables.events]]), with row VALUES
    * byte-identical. µs/ms timestamp columns round-trip with their
    * annotations intact. An external reader that needs the ns
    * annotation back must keep the original files.
    */
  private def withNanosShim[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Z-ORDER compaction: rewrite a parquet directory clustered on the
    * MORTON interleave of several columns' quantile codes, so each
    * output file covers a small hyper-box in ALL `zCols` dimensions and
    * parquet row-group min/max stats (≡ file-level at one row group per
    * file) prune the scan for predicates on ANY of them — ZOrderSpec
    * measures the decoded-row reduction directly.
    * This is the multi-dimensional upgrade of
    * [[compactParquet]]`(sortCols=…)`: 1-D range clustering makes files
    * tight on the leading column and leaves every other column's span
    * at ~full range (a filter on the second column prunes nothing);
    * interleaving bits trades a little per-dimension tightness for
    * bounded spans on every clustered dimension — the layout a table
    * with TWO hot filter columns needs.
    *
    * Scale shape: per-column codes come from `approxQuantile`
    * boundaries (sampling-based sketch, one pass, driver state =
    * 2^bits doubles per column) — NOT a `percent_rank` global window,
    * which would sort the whole table on one partition. Bucket lookup
    * is a codegen'd fold over the broadcast boundary array; the only
    * shuffle is the final `repartitionByRange` on the z-code, which is
    * the rewrite's raison d'être. `bits`=8 → 256 buckets/dimension =
    * 65k cells for 2 columns, plenty for FILE-level (not row-level)
    * clustering at any corpus size.
    *
    * Returns the output file count. Numeric/date/timestamp `zCols`
    * (cast to double for coding); codes are layout-only — row VALUES
    * are byte-identical to the input (TIMESTAMP(NANOS) inputs, which
    * Spark cannot write back, re-emerge as the engine's INT64
    * epoch-nanos contract — see [[withNanosShim]]). Known z-curve edge (ZOrderSpec
    * pins it): a file whose z-range straddles a high-order Morton bit
    * flip spans ~the full range of one dimension — the clustering
    * guarantee is about the TYPICAL file, and aggregate pruning still
    * dominates 1-D layouts whenever more than one column is filtered.
    */
  def compactZOrder(spark: SparkSession, inDir: String, outDir: String,
                    targetBytes: Long, zCols: Seq[String],
                    bits: Int = 8): Int = {
    require(zCols.size >= 2, "z-order needs at least two columns")
    require(bits >= 1 && bits <= 16 && bits * zCols.size <= 60,
      s"bits=$bits × ${zCols.size} cols must fit a Long")
    require(targetBytes > 0)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    val inputBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inDir)).getLength
    val nFiles = math.max(1, math.ceil(inputBytes.toDouble / targetBytes).toInt)
    withNanosShim(spark) {
    val src = spark.read.parquet(inDir)
    val nBuckets = 1 << bits
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val asDouble = zCols.map(c => col(c).cast("double").as(s"__zd_$c"))
    val forQuantiles = src.select(asDouble: _*)
    // ONE approxQuantile pass for ALL z-columns (r10: the multi-column
    // overload merges every column's quantile sketch in the same scan —
    // the per-column form cost one full input read per dimension, which
    // at 100 TB is the difference between 1× and |zCols|× the compaction
    // read amplification before the rewrite even starts)
    val allBounds = forQuantiles.stat.approxQuantile(
      zCols.map(c => s"__zd_$c").toArray, probs, 1.0 / (4 * nBuckets))
    val codes = zCols.zip(allBounds).map { case (c, bounds) =>
      val boundsArr = array(bounds.toSeq.map(lit): _*)
      // code = #boundaries <= value  (codegen'd fold, 0..nBuckets-1)
      aggregate(boundsArr, lit(0L),
        (acc, b) => acc + when(col(c).cast("double") >= b, 1L).otherwise(0L))
    }
    val z = (0 until bits).flatMap { b =>
      codes.zipWithIndex.map { case (code, i) =>
        shiftleft(shiftrightunsigned(code, b).bitwiseAND(lit(1L)),
          b * zCols.size + i)
      }
    }.reduce[org.apache.spark.sql.Column](_.bitwiseOR(_))
    src.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
    }
    fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Write `df` as a Hive-style PARTITIONED parquet layout
    * (`outDir/col=value/…`) — the single largest scan-reduction lever
    * at 100 TB (VERDICT r7 missing #1): a predicate on a partition
    * column prunes whole directories at PLANNING time (the scan's
    * `PartitionFilters`, zero data read for excluded partitions), and
    * a fact⋈dim join whose dim side is filtered gets the same pruning
    * at RUNTIME via dynamic partition pruning (the
    * `DynamicPruningExpression` subquery duplicates the dim filter
    * onto the fact's partition column, reusing the join's broadcast).
    * PartitionPruningSpec plan-asserts both paths on a
    * date-partitioned copy of the test tables.
    *
    * Layout discipline the caller owns: partition columns must be
    * LOW-cardinality (date/month/region — 10²-10⁴ directories; a
    * high-cardinality key creates the small-files problem
    * [[compactParquet]] exists to fix), and rows-per-partition should
    * land near the file-size sweet spot — pass `filesPerPartition`
    * > 1 only when single partition dirs would exceed a few GB.
    *
    * Returns the number of partition directories written.
    */
  def writePartitioned(df: DataFrame, partitionCols: Seq[String],
                       outDir: String, filesPerPartition: Int = 1): Int = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(filesPerPartition > 0)
    // repartition by the partition columns so each output dir is
    // written by `filesPerPartition` tasks, not by every task that
    // happens to hold a row of it (the accidental small-files layout)
    val keys = partitionCols.map(col)
    val spread =
      if (filesPerPartition == 1) df.repartition(keys: _*)
      else {
        // explicit partition count: AQE is free to coalesce a
        // no-count repartition, which would merge the spread buckets
        // back into one writer task and silently defeat the split
        val n = df.sparkSession.sessionState.conf.numShufflePartitions
        df.repartition(n, (keys :+ (abs(xxhash64(df.columns.map(col): _*))
          % filesPerPartition)): _*)
      }
    spread.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(outDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outDir), df.sparkSession.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(s => s.isDirectory &&
        s.getPath.getName.startsWith(partitionCols.head + "="))
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

  /** Write `df` as a BUCKETED parquet table: rows are hash-distributed
    * into `nBuckets` files per partition by `bucketCol`, and the bucket
    * spec is recorded in the catalog. This is the pay-the-shuffle-once
    * layout lever for 100 TB JOIN/AGG workloads: two tables bucketed by
    * the same key into the same bucket count join with ZERO Exchange on
    * either side (BucketedJoinSpec plan-asserts it) — the nightly
    * fact⋈fact join that would shuffle 100 TB per run instead reads
    * co-located buckets, paying the distribution cost once at write
    * time. `sortCols` additionally sorts within each bucket file, which
    * upgrades the join to sort-free SortMergeJoin and tightens per-file
    * min/max stats.
    *
    * Bucketing requires a catalog entry (the bucket spec lives in table
    * metadata, not parquet footers), hence `saveAsTable` — under the
    * in-memory session catalog here, a Hive/Glue/Unity catalog in
    * production; the layout on disk is identical.
    *
    * Sizing discipline the caller owns: `nBuckets` is FIXED at write
    * time — pick it so a bucket ≈ one healthy task (128-512 MB) at the
    * table's TARGET size, not today's; re-bucketing is a full rewrite.
    */
  def writeBucketedTable(df: DataFrame, tableName: String, bucketCol: String,
                         nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets > 0)
    // tableName is interpolated into a backtick-quoted DROP TABLE — a
    // backtick (or any SQL punctuation) in the name would break out of
    // the identifier (the constraint-name lesson applied to every
    // interpolated string): accept plain identifiers only.
    require(tableName.matches("[A-Za-z0-9_]+"),
      s"writeBucketedTable: unsafe table name '$tableName'")
    // Overwrite must survive a PREVIOUS JVM's leftovers: an in-memory
    // session catalog dies with its JVM but the managed table's
    // warehouse directory does not, and CTAS onto an orphaned location
    // throws LOCATION_ALREADY_EXISTS instead of overwriting. Drop any
    // catalog entry, then clear the stale location explicitly — the
    // rewrite-every-run staleness discipline depends on this being
    // idempotent across sessions.
    val ss = df.sparkSession
    ss.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val loc = new org.apache.hadoop.fs.Path(
      ss.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(tableName)))
    val fs = loc.getFileSystem(ss.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*))
      .saveAsTable(tableName)
  }

  /** Source-staleness fingerprint of a parquet file/directory: the
    * sorted (name, length, mtime) tuples of every plain file under
    * `dir`, md5'd. Cheap (one filesystem listing, no data read) and
    * exactly the signal the rewrite-every-run staleness discipline
    * needs: the driver regenerating the testdata rewrites the parquet
    * files, which moves their length or mtime, which invalidates any
    * layout memoized against the old fingerprint. Listing is
    * NON-recursive by design — the engine's layout inputs are flat
    * parquet files/dirs; a partitioned source would need the recursive
    * form (and at 10⁸ files a manifest/catalog snapshot id instead).
    */
  def dirFingerprint(spark: SparkSession, dir: String): String = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(path).filter(_.isFile)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** DATA-IDENTITY fingerprint of a DataFrame's file-backed inputs
    * (VERDICT r13 #4): the sorted (path, length, mtime) tuples of every
    * file the plan reads (`Dataset.inputFiles` — the public leaf-scan
    * enumeration), md5'd. This is the missing staleness component of
    * the artifact memos: a plan's SEMANTIC hash is identical before and
    * after the files under the same path are rewritten, so a memo keyed
    * on the plan alone serves a stale artifact (centroids, BPE merges)
    * against regenerated data. Folding this fingerprint into the key
    * makes the memo watch the DATA, not the path — the
    * [[dirFingerprint]] discipline extended from explicit directories
    * to arbitrary plans. Frames with no file-backed leaves (memory
    * streams, literal ranges) fingerprint as a constant, preserving the
    * plan-hash-only behavior where no files exist to go stale.
    *
    * Cost: ONE listStatus RPC per distinct parent directory per memo
    * LOOKUP (ADVICE r14: the first cut issued a serial getFileStatus
    * per FILE — on an object store that is N round-trips where the
    * directory listing is one) — genuinely listing cost, negligible
    * next to the refit it guards. A file named by `inputFiles` but
    * absent from its directory's listing (an external regeneration
    * replaced the part files between plan construction and this
    * lookup) folds into the fingerprint as a `missing` marker instead
    * of throwing: a mid-rewrite race moves the fingerprint and forces
    * a refit — the safe outcome — rather than failing the fit/search
    * entry point with FileNotFoundException.
    */
  def filesFingerprint(df: DataFrame): String = {
    val files = df.inputFiles
    if (files.isEmpty) "nofiles"
    else {
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      val stats = files.groupBy(f =>
          new org.apache.hadoop.fs.Path(f).getParent)
        .flatMap { case (dir, names) =>
          val wanted = names.map(f =>
            new org.apache.hadoop.fs.Path(f).getName).toSet
          val listed =
            try {
              dir.getFileSystem(conf).listStatus(dir).iterator
                .filter(s => wanted(s.getPath.getName))
                .map(s => s.getPath.getName ->
                  s"${s.getLen}:${s.getModificationTime}")
                .toMap
            } catch {
              // directory itself vanished mid-rewrite: every file in it
              // fingerprints as missing (refit, not crash)
              case _: java.io.FileNotFoundException =>
                Map.empty[String, String]
            }
          names.toSeq.map { f =>
            val name = new org.apache.hadoop.fs.Path(f).getName
            f -> listed.getOrElse(name, "missing")
          }
        }
      val entries = files.sorted.map(f => s"$f:${stats(f)}").mkString("|")
      java.security.MessageDigest.getInstance("MD5")
        .digest(entries.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
  }

  /** Per-session memo of completed layout rewrites: layout key →
    * source fingerprint at write time. Weak-keyed by the OWNING
    * session (a bucketed table lives in that session's catalog, so the
    * memo must die with it; the values hold no session reference, so
    * the weak key actually collects). VERDICT r10 #3: the two
    * layout-read-back declared queries used to re-run their full
    * rewrite on EVERY invocation for staleness safety — ~5% of bench
    * suite wall-time spent re-writing an unchanged layout. The
    * fingerprint carries the same staleness guarantee at the cost of
    * one directory listing: rewrite when (and only when) the source
    * files changed, the layout is missing, or the JVM is fresh.
    */
  private val layoutMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  private def memoFor(ss: SparkSession) = layoutMemo.synchronized {
    var m = layoutMemo.get(ss)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, String]()
      layoutMemo.put(ss, m)
    }
    m
  }

  /** [[writeBucketedTable]] memoized on (session, layout params, source
    * fingerprint): skips the rewrite when THIS session already wrote
    * `tableName` with the same spec from byte-identical source files —
    * and re-runs it the moment the fingerprint moves (regenerated
    * testdata can never leave a stale layout behind, the r8 lesson).
    * `srcDir` must be the parquet location `df` reads from; the
    * staleness check is on those files.
    */
  def writeBucketedTableCached(df: DataFrame, srcDir: String,
                               tableName: String, bucketCol: String,
                               nBuckets: Int,
                               sortCols: Seq[String] = Nil): Unit = {
    val ss = df.sparkSession
    val key = s"bucketed:$tableName:$bucketCol:$nBuckets:${sortCols.mkString(",")}"
    val fp = dirFingerprint(ss, srcDir)
    val memo = memoFor(ss)
    if (memo.get(key) != fp || !ss.catalog.tableExists(tableName)) {
      writeBucketedTable(df, tableName, bucketCol, nBuckets, sortCols)
      memo.put(key, fp)
    }
  }

  /** [[compactZOrder]] memoized the same way: rewrite once per
    * (session, z-spec, source fingerprint), skip while the input files
    * and the output directory are both intact.
    */
  def compactZOrderCached(spark: SparkSession, inDir: String, outDir: String,
                          targetBytes: Long, zCols: Seq[String],
                          bits: Int = 8): Unit = {
    val key = s"zorder:$outDir:${zCols.mkString(",")}:$bits:$targetBytes"
    val fp = dirFingerprint(spark, inDir)
    val memo = memoFor(spark)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val outFs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (memo.get(key) != fp || !outFs.exists(outPath)) {
      compactZOrder(spark, inDir, outDir, targetBytes, zCols, bits)
      memo.put(key, fp)
    }
  }

  /** Generic (session, key, source-fingerprint) memo runner for a
    * derived on-disk artifact — the [[writeBucketedTableCached]] /
    * [[compactZOrderCached]] pattern factored out so new derived
    * layouts (e.g. the media corpus files) inherit the same staleness
    * contract: `build` runs when the memoized fingerprint for `key` is
    * missing/stale (fresh JVM, regenerated source files) or `outDir`
    * is gone; otherwise the existing artifact is reused. `srcDir` must
    * be the files the artifact derives from.
    */
  def materializeCached(spark: SparkSession, key: String, srcDir: String,
                        outDir: String)(build: => Unit): Unit = {
    val fp = dirFingerprint(spark, srcDir)
    val memo = memoFor(spark)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val outFs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (memo.get(key) != fp || !outFs.exists(outPath)) {
      build
      memo.put(key, fp)
    }
  }

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

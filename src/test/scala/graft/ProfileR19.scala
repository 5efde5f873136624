package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 attribution profiler (the PipelineProfile pattern): one
  * fresh JVM, DEBUG logging on DedupOps so connectedComponents' per
  * round checksum lines surface ROUND COUNTS for the heavy CC keys,
  * plus noop-sinked stage splits for q_interval_join and the
  * quality-signal passes. Measurement tooling only — nothing here is
  * a declared query or an engine change.
  */
object ProfileR19 {
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def t(name: String)(f: => Unit): Unit = {
    val samples = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"PROF $name min=${samples.min}%.3f " +
      s"samples=${samples.map(s => f"$s%.3f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // surface the CC round/checksum debug lines
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.operators", org.apache.logging.log4j.Level.DEBUG)
    Bench.warmupRelational(spark, d)
    Bench.warmupSubsystems(spark, d)

    def hygiene(): Unit = {
      spark.catalog.clearCache()
      graft.operators.Lineage.releaseAll(spark)
      System.gc()
    }

    val which = if (args.isEmpty) Set("cc", "interval", "quality") else args.toSet

    if (which("cc")) {
      // heavy CC consumers: run each declared key once with round
      // logging, then time it min-of-3
      for (name <- Seq("q_dedup_canonical", "q_dedup_incremental_cc",
          "q_knn_upsert_cc", "q_knn_graph_stored", "q_knn_mutual_cc",
          "q_neardup_clusters_star")) {
        println(s"=== CC ROUNDS for $name ===")
        val fn = SparkEntry.queries(name)
        fn(spark, d).count()
        hygiene()
        t(name)(fn(spark, d).count())
        hygiene()
      }
    }

    if (which("interval")) {
      println("=== q_interval_join stage split ===")
      def iv = graft.operators.EventOps.sessionizeOn(
          Tables.events(spark, d), expr("ts div 1000"),
          30L * 60L * 1000L * 1000L)
        .select(
          (col("user_id") * lit(4294967296L) + col("session_id")).as("iv_id"),
          col("session_start").as("s_start"),
          (col("session_end") + lit(7200000000L)).as("s_end"))
      t("iv_sessionize")(noop(iv))
      hygiene()
      def pairs = graft.operators.Relational.intervalOverlapPairs(
        iv, cellUs = 3600000000L)
      t("pairs_noop")(noop(pairs))
      hygiene()
      def filtered = pairs
        .withColumn("user_a", expr("a_id div 4294967296L"))
        .withColumn("user_b", expr("b_id div 4294967296L"))
        .filter(col("user_a") =!= col("user_b"))
      t("pairs_userfilter_noop")(noop(filtered))
      hygiene()
      def agg0 = filtered.groupBy("user_a", "user_b")
        .agg(count(lit(1)).cast("long").as("n_overlaps"),
          sum(col("ov_us")).cast("long").as("ov_us_total"))
      t("pairs_agg_noop")(noop(agg0))
      hygiene()
      t("full_sorted_count")(
        SparkEntry.queries("q_interval_join")(spark, d).count())
      hygiene()
    }

    if (which("quality")) {
      println("=== quality signal passes (q_quality_agreement4 parts) ===")
      def docs = Tables.documents(spark, d)
      def target = docs.filter(col("lang") === "en")
      t("textQuality")(noop(graft.operators.TextOps.textQuality(
        docs, Seq("a", "the", "of", "and", "in"))))
      hygiene()
      t("surprisalBits")(noop(graft.operators.TextOps.surprisalBits(docs)))
      hygiene()
      t("importanceWeights")(noop(
        graft.operators.TextOps.importanceWeights(docs, target, 1024)))
      hygiene()
      t("surprisalBigramBits")(noop(
        graft.operators.TextOps.surprisalBigramBits(docs, 1104L)))
      hygiene()
      t("q_quality_agreement4")(
        SparkEntry.queries("q_quality_agreement4")(spark, d).count())
      hygiene()
      t("q_boilerplate")(
        SparkEntry.queries("q_boilerplate")(spark, d).count())
      hygiene()
    }
    spark.stop()
  }
}

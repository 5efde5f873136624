package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** In-suite-position repro tool for the BENCH pipeline-key inflation
  * (round 17, VERDICT r16 #1): run a co-tenant prefix of the declared
  * suite under the EXACT Bench hygiene protocol, then time
  * q_pipeline_curate min-of-2 with per-stage attribution. Usage:
  *   runMain graft.SuiteRepro <prefixSpec>
  * where prefixSpec is `none`, `heavy` (the artifact/graph families),
  * or `all` (every key alphabetically before q_pipeline_curate).
  */
object SuiteRepro {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("heavy")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
    // A/B knob: cap the always-on status-store retention (the live-UI
    // InMemoryStore grows with every job/stage/execution of the suite
    // even with the UI disabled)
    if (sys.env.get("SPARK_GRAFT_LOWRETAIN").contains("1")) {
      builder.config("spark.ui.retainedJobs", "50")
        .config("spark.ui.retainedStages", "100")
        .config("spark.ui.retainedTasks", "1000")
        .config("spark.sql.ui.retainedExecutions", "10")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-job scheduler-overhead probe: 30 trivial 1-task jobs — if
    // PER-JOB cost grows with suite position, multi-job queries (the
    // pipelines run 15-20 jobs per sample) inflate while 1-job
    // controls stay flat
    def jobProbe(tag: String): Unit = {
      val t0 = System.nanoTime()
      (1 to 30).foreach(_ => spark.sparkContext
        .parallelize(Seq(1), 1).count())
      println(f"JOBPROBE $tag ${(System.nanoTime() - t0) / 1e6 / 30}%.1f ms/job")
    }
    jobProbe("fresh")
    // Bench.runSuite warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$d/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    val names = SparkEntry.queries.keys.toSeq.sorted
    val prefix = mode match {
      case "none" => Seq.empty
      case "all" => names.takeWhile(_ < "q_pipeline_curate")
      case _ => names.filter(n => n < "q_pipeline_curate" &&
        (n.startsWith("q_knn") || n.startsWith("q_pack") ||
         n.startsWith("q_neardup") || n.startsWith("q_minhash") ||
         n.startsWith("q_dedup") || n.startsWith("q_ann") ||
         n.startsWith("q_bm25") || n.startsWith("q_ivf") ||
         n.startsWith("q_index") || n.startsWith("q_pagerank") ||
         n.startsWith("q_interval") || n.startsWith("q_kcore")))
    }
    println(s"PREFIX ${prefix.size} keys ($mode)")
    prefix.foreach { n =>
      val t = Bench.timeOnce(SparkEntry.queries(n)(spark, d).count())
      spark.catalog.clearCache()
      graft.operators.Lineage.releaseAll(spark)
      System.gc()
      println(f"COTENANT $n $t%.2f s")
    }
    jobProbe("post_prefix")
    // the pipeline exactly as Bench times it, plus stage attribution
    (1 to 2).foreach { i =>
      val t = Bench.timeOnce(
        SparkEntry.queries("q_pipeline_curate")(spark, d).count())
      println(f"PIPE sample$i $t%.2f s")
    }
    spark.catalog.clearCache()
    graft.operators.Lineage.releaseAll(spark)
    System.gc()
    // stage attribution AFTER the suite state built up
    def docs = Tables.documents(spark, d)
    val input = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
      .unionByName(docs.filter(pmod(col("doc_id"), lit(200)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(10000000L)))
    val bench = docs.filter(pmod(col("doc_id"), lit(100)) === 50)
    graft.operators.CurationPipeline.stages(input, bench,
      onStage = (n, s) => println(f"STAGE $n $s%.2f s"))
    spark.stop()
  }
}

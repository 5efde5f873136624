package graft

import graft.operators.CurationPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway-style stage profiler for q_pipeline_curate (round 13):
  * times each pipeline stage's materialization separately so the 7 s
  * suite cost can be attributed to a stage instead of guessed at.
  */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = Tables.documents(spark, d)
    val input = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
      .unionByName(docs.filter(pmod(col("doc_id"), lit(200)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(10000000L)))
    val bench = docs.filter(pmod(col("doc_id"), lit(100)) === 50)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // stages() lineage-truncates each frame eagerly, so the onStage
    // callback observes each stage's own compute cost
    val st = t("build_all_stages") {
      CurationPipeline.stages(input, bench,
        onStage = (n, s) => println(f"STAGE $n $s%.2f s"))
    }
    // micro-split of the dominant neardup stage on the post-exact frame
    import graft.operators.{DedupOps, Lineage}
    val d1 = st.afterExactDedup
    val pairs = t("sub_lsh_pairs") {
      val p = DedupOps.lshVerifiedJaccardPairsUnsorted(d1, 32, 2, 80)
        .select("a_id", "b_id")
      Lineage.truncate(p, None)
    }
    println("pairs=" + pairs.count())
    val clustered = t("sub_cc") {
      DedupOps.connectedComponents(pairs)
    }
    println("clustered=" + clustered.count())
    val keepers = t("sub_keepers") {
      val toks = d1.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val k = clustered.select(col("id").as("doc_id"), col("cluster_id"))
        .join(toks, "doc_id")
        .groupBy("cluster_id")
        .agg(max_by(col("doc_id"), struct(col("n_tokens"), -col("doc_id")))
          .as("doc_id"))
        .select("doc_id")
      Lineage.truncate(k, None)
    }
    println("keepers=" + keepers.count())
    t("n_input")(println(st.input.count()))
    t("n_exact")(println(st.afterExactDedup.count()))
    t("n_neardup")(println(st.afterNearDup.count()))
    t("n_decon")(println(st.afterDecontaminate.count()))
    t("n_quality")(println(st.afterQuality.count()))
    t("n_dsir")(println(st.afterDsir.count()))
    t("n_pack")(println(st.packedBins.count()))
    spark.stop()
  }
}

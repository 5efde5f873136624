package graft

import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-breakdown profiler for the near-dup clustering family
  * (q_dedup_canonical / q_cluster_cap_sample shape): times each pipeline
  * stage twice (cold then warm) so the expensive stage is attributable.
  * Supersedes the older ClusterDebug ignored-test harness (one profiler
  * to maintain — review fix r11). Run:
  * sbt "Test/runMain graft.ProfileClusters"
  */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def t(name: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"[prof] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
        spark.catalog.clearCache()
        graft.operators.Lineage.releaseAll(spark)
      }
    }

    val docs = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(4)) === 0)
    t("docs.scan")(docs.count())
    t("minhash_sigs")(DedupOps.minHashSignatures(docs, 32).count())
    t("candidates")(DedupOps.minHashCandidatesUnsorted(docs, 32, 2).count())
    t("verified_pairs")(
      DedupOps.lshVerifiedJaccardPairsUnsorted(docs, 32, 2, 80).count())
    val pairs = DedupOps.lshVerifiedJaccardPairsUnsorted(docs, 32, 2, 80)
      .select("a_id", "b_id")
    t("forest_only")(DedupOps.localSpanningForest(pairs).count())
    t("cc_only")(DedupOps.connectedComponents(pairs).count())
    t("canonical_full")(
      DedupOps.canonicalKeepers(docs, 32, 2, 80).count())
    t("cap_sample_full")(
      DedupOps.clusterCapSample(docs, 32, 2, 80, 2).count())
    spark.stop()
  }
}

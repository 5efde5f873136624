package graft

import org.apache.spark.sql.SparkSession

/** A/B harness for the SimHash aggregation shape (SCALE.md "future
  * passes"; VERDICT r6 #6): 64 `sum(when(...))` codegen'd aggregate
  * columns ([[graft.operators.DedupOps.simHashWide]]) vs ONE
  * bit-packed `TypedImperativeAggregate` buffer
  * ([[graft.plans.SimHashAgg]], now the [[graft.operators.DedupOps
  * .simHash]] production path — the packed form won this A/B).
  *
  * Samples ALTERNATE A/B/A/B in the same JVM so host-load drift hits
  * both forms equally — the round-7 regression triage showed this box
  * swinging 2–6× between back-to-back fresh JVMs, which would swamp a
  * sequential A-then-B comparison.
  *
  * Usage: `sbt "runMain graft.SimHashAB"` (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_AB_SAMPLES).
  */
object SimHashAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_AB_SAMPLES", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def wide(): Unit = { graft.operators.DedupOps.simHashWide(docs).count(): Unit }
    def packed(): Unit = { graft.operators.DedupOps.simHash(docs).count(): Unit }
    wide(); packed()   // warm both plans (codegen, function registry)
    val (ws, ps) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to n).foreach { _ =>
      ws += Bench.timeOnce(wide())
      ps += Bench.timeOnce(packed())
    }
    val (w, p) = (ws.result(), ps.result())
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString(",")
    println(f"AB simhash wide  min=${w.min}%.3f samples=${fmt(w)} sf=$sfDir")
    println(f"AB simhash packed min=${p.min}%.3f samples=${fmt(p)} sf=$sfDir")
    spark.stop()
  }
}

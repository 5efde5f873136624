package graft

import graft.operators.{Lineage, TextOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B harness behind importanceWeights' fused single-tokenization
  * plan (the [[SimHashAB]] precedent: measured decisions stay
  * re-runnable). `twoPass` is the original formulation — tokenize the
  * corpus once for the fit's bucket counts and AGAIN for the scoring
  * join. The production form instead truncates one (doc, bucket, cnt)
  * frame and derives both halves from it; this main checks result
  * equality and prints min-of-3 timings for both.
  *
  * Measured 2026-08-14 at sf0.1 local[32], same JVM back to back,
  * min-of-3 — two sessions: prototype 1.171 s two-pass vs 0.824 s
  * fused; this committed harness 1.056 s vs 0.869 s. The BINDING
  * record is SCALE.md's (the committed-harness numbers); a re-run of
  * this main should land in that band. At 100 TB the fused form
  * halves the dominant cost, corpus text scans, regardless of the
  * local margin.
  */
object DsirAB {

  /** The pre-fusion formulation, kept verbatim for re-measurement. */
  def twoPass(documents: DataFrame, target: DataFrame,
              numBuckets: Int): DataFrame = {
    val b = lit(numBuckets.toLong)
    val tok = documents
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("word"))
      .select(col("doc_id"), TextOps.hashBucket(col("word"), numBuckets).as("b"))
    val raw = Lineage.truncate(
      tok.groupBy("b").agg(count(lit(1)).as("r_c")), None)
    val tgt = Lineage.truncate(
      target
        .select(explode(TextOps.words(col("text"))).as("word"))
        .select(TextOps.hashBucket(col("word"), numBuckets).as("b"))
        .groupBy("b").agg(count(lit(1)).as("t_c")), None)
    val rTot = raw.agg(coalesce(sum("r_c"), lit(0L)).as("r_tot"))
    val tTot = tgt.agg(coalesce(sum("t_c"), lit(0L)).as("t_tot"))
    val posts = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(rTot)).crossJoin(broadcast(tTot))
      .select(col("b"),
        ((coalesce(col("t_c"), lit(0L)) + lit(1L)).cast(DecimalType(19, 0)) *
          (col("r_tot") + b).cast(DecimalType(19, 0)))
          .cast(DecimalType(38, 0)).as("num"),
        ((col("r_c") + lit(1L)).cast(DecimalType(19, 0)) *
          (col("t_tot") + b).cast(DecimalType(19, 0)))
          .cast(DecimalType(38, 0)).as("den"))
      .select(col("b"), expr("num * 1000000 div (num + den)").as("post_ppm"))
    tok.join(broadcast(posts), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("post_ppm").as("post_sum"))
      .select(col("doc_id"), col("n_tokens"),
        expr("post_sum div n_tokens").as("dsir_ppm"))
      .orderBy("doc_id")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    val tgt = docs.filter(col("lang") === "en")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    val a = TextOps.importanceWeights(docs, tgt, 1024).collect().map(_.toString)
    val c = twoPass(docs, tgt, 1024).collect().map(_.toString)
    println(s"EQUAL=${a.sameElements(c)} n=${a.length}")
    def t(f: => Unit): Double = {
      val s = System.nanoTime; f; (System.nanoTime - s) / 1e9
    }
    val tp = (1 to 3).map(_ => t(twoPass(docs, tgt, 1024).count()))
    val fu = (1 to 3).map(_ => t(TextOps.importanceWeights(docs, tgt, 1024).count()))
    println(f"TWOPASS min=${tp.min}%.3f samples=${tp.map(x => f"$x%.3f").mkString(",")}")
    println(f"FUSED   min=${fu.min}%.3f samples=${fu.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}

package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics for the round-16 kNN upsert shape (builder
  * tool, not a spec): per-stage row counts and timings at a given SF.
  */
object UpsertDebug {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = Tables.embeddings(spark, sf)
    val batch = emb.filter(pmod(col("vec_id"), lit(9)) =!= 5 &&
        pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
      .unionByName(emb.filter(pmod(col("vec_id"), lit(7)) === 3)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          col("embedding")))
    val deletes = emb.filter(pmod(col("vec_id"), lit(9)) === 5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    println(s"n_base=${emb.count()} n_batch=${batch.count()} " +
      s"n_del=${deletes.size}")
    val merged = SimilarityOps.upsertedCorpus(emb, batch, deletes)
    t("from_scratch_frozen_planes") {
      println(s"  edges=${SimilarityOps.knnGraphExactWithPlanes(merged, emb, 0L until 8L, 3).count()}")
    }
    t("from_scratch_base") {
      println(s"  edges=${SimilarityOps.knnGraphExact(emb, 0L until 8L, 3).count()}")
    }
    val dir = java.nio.file.Files.createTempDirectory("upsert_dbg").toString
    val g = t("edges_upsert") {
      val d = SimilarityOps.knnGraphUpserted(emb, batch, deletes,
        s"$sf/embeddings.parquet", dir, 0L until 8L, 3).localCheckpoint()
      println(s"  edges=${d.count()}")
      d
    }
    val mutual = t("mutuality") {
      val m = g.select("q_id", "n_id")
        .join(g.select(col("n_id").as("q_id"), col("q_id").as("n_id")),
          Seq("q_id", "n_id"), "left_semi")
        .filter(col("q_id") < col("n_id"))
      println(s"  mutual=${m.count()}")
      m
    }
    t("cc") {
      val cc = SimilarityOps.mutualKnnClustersUpserted(emb, batch, deletes,
        s"$sf/embeddings.parquet", dir, 0L until 8L, 3)
      println(s"  clusters_rows=${cc.count()}")
    }
    val _ = mutual
    spark.stop()
  }
}

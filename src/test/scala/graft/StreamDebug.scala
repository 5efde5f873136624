package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Runtime drive of the streaming surface (Test/runMain graft.StreamDebug):
  * file-source stream over the ratings fixture → chunkedLoad → parquet.
  */
object StreamDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val schema = StructType(Seq(
      StructField("userId", IntegerType), StructField("movieId", IntegerType),
      StructField("rating", DoubleType), StructField("timestamp", LongType)))
    val stream = spark.readStream.schema(schema).option("header", true)
      .csv("/root/repo/src/test/resources/fixtures/ratings*.csv")
      .withColumn("rated_at", timestamp_seconds(col("timestamp")))
    val out = java.nio.file.Files.createTempDirectory("stream_out").toString
    val cp = java.nio.file.Files.createTempDirectory("stream_cp").toString
    val q = StreamingOps.chunkedLoad(stream,
      (batch, _) => batch.write.mode("append").parquet(s"$out/ratings"), cp).start()
    q.awaitTermination(60000)
    val back = spark.read.parquet(s"$out/ratings")
    println(s"[StreamDebug] rows loaded through stream: ${back.count()}")
    back.orderBy("userId", "movieId").show(5)
    spark.stop()
  }
}

package graft

import graft.multimodal.MultimodalOps
import org.apache.spark.sql.functions._

/** Round-13: the binaryFile media-ingest loop (VERDICT r11 #5). The
  * declared q_media_ingest hash-checks the ingested fingerprints
  * against the DuckDB arithmetic replay; this spec pins the loop's
  * mechanics directly — file materialization from executors, id
  * recovery from file names, byte-exact payload round-trip, and the
  * fingerprint-memoized write skipping when the source is unchanged.
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  private def mediaRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"media_$tag").toString

  test("writeMediaFiles → binaryFile scan round-trips ids and bytes exactly") {
    val ids = spark.range(0, 12).select((col("id") * 25).as("media_id"))
    val imgs = MultimodalOps.syntheticImages(ids)
    val root = mediaRoot("rt")
    MultimodalOps.writeMediaFiles(imgs, s"$root/img", "img_")

    // one file per row, named by id, extension from meta.format
    // drop the local-FS checksum sidecars (leading dot — hidden files
    // the binaryFile scan ignores too; HDFS keeps checksums internal)
    val files = new java.io.File(s"$root/img").listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet
    val wantNames = ids.as[Long].collect().map(id => s"img_$id.png").toSet
    assert(files == wantNames)

    // binaryFile scan + regexp id recovery restores the exact payloads
    val back = MultimodalOps.fromBinaryFiles(spark, s"$root/img", "image")
      .withColumn("media_id",
        regexp_extract(col("path"), "img_(\\d+)\\.png$", 1).cast("long"))
      .select("media_id", "payload")
    val origBytes = imgs.select("media_id", "payload").as[(Long, Array[Byte])]
      .collect().map { case (id, b) => id -> b.toSeq }.toMap
    val gotBytes = back.as[(Long, Array[Byte])]
      .collect().map { case (id, b) => id -> b.toSeq }.toMap
    assert(gotBytes == origBytes, "payload bytes must survive the file round-trip")

    // the scan's format metadata comes from the extension
    val fmts = MultimodalOps.fromBinaryFiles(spark, s"$root/img", "image")
      .select("meta.format").distinct().as[String].collect().toSeq
    assert(fmts == Seq("png"))
  }

  test("ingested fingerprints equal the in-plan pipeline's (both modalities)") {
    val d = "/root/testdata/sf0.001"
    val inPlan = Queries.queries("q_media_fingerprint")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val ingested = Queries.queries("q_media_ingest")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ingested.nonEmpty && ingested == inPlan,
      "binaryFile ingest must reproduce the in-plan fingerprints exactly")
  }

  test("media materialization is memoized on the source fingerprint") {
    val d = "/root/testdata/sf0.001"
    Queries.queries("q_media_ingest")(spark, d).collect()
    val root = new java.io.File(
      s"target/media_rb_${math.abs(d.hashCode.toLong)}").getAbsolutePath
    val before = new java.io.File(s"$root/img").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    assert(before.nonEmpty)
    Queries.queries("q_media_ingest")(spark, d).collect()
    val after = new java.io.File(s"$root/img").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after == before,
      "unchanged source must not re-materialize the media files")
  }
}

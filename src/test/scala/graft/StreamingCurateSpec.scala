package graft

import graft.operators.DedupOps
import graft.streaming.StreamingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins [[StreamingOps.curateIngest]] — the continuous curation loop:
  * per micro-batch quality filter → in-batch exact dedup → verified
  * near-dup probe → accept → index upsert, with per-batch accounting
  * that PARTITIONS the arrivals (every doc gets exactly one decision),
  * cross-batch flagging through the maintained index, restart
  * continuity from a persisted index, and final index ≡ from-scratch
  * rebuild on corpus + accepted.
  */
class StreamingCurateSpec extends SparkSpec {
  import spark.implicits._

  private val nh = 16
  private val rpb = 2
  private val tau = 60

  private val corpus = Seq(
    (100L, "alpha beta gamma delta epsilon"),
    (101L, "one two three four five"))
    .toDF("doc_id", "text")

  // 10-word texts: altering the last word gives J = 9/11 ≈ 82% ≥ τ=60
  private val freshA = "curated pipelines deduplicate training corpora across many shards cleanly today"
  private val freshB = "vector search ranks candidate neighbours using quantized integer arithmetic routines"
  private val freshC = "streaming watermarks bound state for unbounded ingestion workloads safely forever"
  private def nearDupOf(text: String): String = {
    val ws = text.split(" "); (ws.dropRight(1) :+ "altered").mkString(" ")
  }

  test("curation loop: accounting partitions arrivals; cross-batch + restart flagging; index = rebuild") {
    implicit val sqlCtx = spark.sqlContext

    val stats = scala.collection.mutable.ArrayBuffer.empty[StreamingOps.CurateBatchStats]
    val acceptedRows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def sink(df: DataFrame, id: Long): Unit =
      acceptedRows ++= df.select("doc_id", "text").as[(Long, String)].collect()

    def mkLoop(input: MemoryStream[(Long, String)],
               bands: DataFrame, sets: DataFrame, tag: String) =
      StreamingOps.curateIngest(
        input.toDF().toDF("doc_id", "text"), bands, sets,
        numHashes = nh, rowsPerBand = rpb, minJaccardPct = tau,
        stopwords = Seq("the", "a"), minWords = 5L,
        maxStopwordPpm = 900000L,
        checkpoint = java.nio.file.Files
          .createTempDirectory(s"curate_$tag").toString,
        writeAccepted = sink, onStats = stats += _)

    // ---- continuous run: batches 1 and 2 through ONE query ----
    val in1 = MemoryStream[(Long, String)]
    val loop1 = mkLoop(in1,
      DedupOps.corpusBandDocs(corpus, nh, rpb),
      DedupOps.corpusHashedSets(corpus), "run1")
    val q1 = loop1.writer.start()
    try {
      // batch 1: fresh doc + a 2-word quality reject + an exact dup of
      // the fresh doc (same text, larger id → exact-dedup reject)
      in1.addData((10L, freshA), (11L, "too short"), (12L, freshA))
      q1.processAllAvailable()
      // batch 2: fresh doc + a near-dup of batch 1's ACCEPTED doc —
      // only a live upsert can flag it (freshA postdates the seed index)
      in1.addData((20L, freshB), (21L, nearDupOf(freshA)))
      q1.processAllAvailable()
    } finally q1.stop()

    assert(stats.map(s => (s.rowsIn, s.rejectedQuality, s.rejectedExact,
        s.rejectedNearDup, s.accepted)).toSeq ===
      Seq((3L, 1L, 1L, 0L, 1L), (2L, 0L, 0L, 1L, 1L)))

    // ---- restart: a NEW loop seeded from the persisted index ----
    val (bands1, sets1) = loop1.index()
    val in2 = MemoryStream[(Long, String)]
    val loop2 = mkLoop(in2, bands1, sets1, "run2")
    val q2 = loop2.writer.start()
    try {
      // near-dup of doc accepted before the restart + an exact copy of
      // an accepted doc (J=100% → near-dup flag, NOT in-batch exact) +
      // one genuinely fresh doc
      in2.addData((30L, nearDupOf(freshB)), (31L, freshA), (32L, freshC))
      q2.processAllAvailable()
    } finally q2.stop()

    assert(stats.size === 3)
    assert((stats(2).rowsIn, stats(2).rejectedQuality, stats(2).rejectedExact,
      stats(2).rejectedNearDup, stats(2).accepted) === (3L, 0L, 0L, 2L, 1L))
    // the accounting invariant: decisions partition every batch
    stats.foreach { s =>
      assert(s.rowsIn === s.rejectedQuality + s.rejectedExact +
        s.rejectedNearDup + s.accepted, s"non-partitioning stats: $s")
    }
    assert(acceptedRows.map(_._1).sorted === Seq(10L, 20L, 32L))

    // loop invariant: the maintained index IS the from-scratch rebuild
    // over corpus + everything accepted across both runs
    val rebuilt = corpus.unionByName(acceptedRows.toSeq.toDF("doc_id", "text"))
    val (bandsF, setsF) = loop2.index()
    assert(bandsF.exceptAll(DedupOps.corpusBandDocs(rebuilt, nh, rpb)).count() === 0L)
    assert(DedupOps.corpusBandDocs(rebuilt, nh, rpb).exceptAll(bandsF).count() === 0L)
    assert(setsF.exceptAll(DedupOps.corpusHashedSets(rebuilt)).count() === 0L)
    assert(DedupOps.corpusHashedSets(rebuilt).exceptAll(setsF).count() === 0L)
  }

  test("batch twin parity: flagAgainstIndexVerified equals the streaming verified tier") {
    implicit val sqlCtx = spark.sqlContext
    val probes = Seq(
      (1L, "alpha beta gamma delta zeta"),          // J=4/6 vs 100 → 67% ≥ 60
      (2L, "totally unrelated fresh words here"),
      (3L, "one two three four six"),               // J=4/6 vs 101
      (4L, "another novel document entirely new"))
    val bands = DedupOps.corpusBandDocs(corpus, nh, rpb)
    val sets = DedupOps.corpusHashedSets(corpus)
    val got = DedupOps.flagAgainstIndexVerified(
      probes.toDF("doc_id", "text"), bands, sets, nh, rpb, tau)
      .as[Long].collect().toSet

    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val df = input.toDF().toDF("doc_id", "text", "ts_ts")
    val q = StreamingOps.toMemorySink(
      StreamingOps.flagNearDupsStreamVerifiedIndexed(df, bands, sets,
        nh, rpb, minJaccardPct = tau),
      "curate_parity", "append")
    val streamed = try {
      input.addData(probes.map { case (id, t) =>
        (id, t, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")) }: _*)
      q.processAllAvailable()
      spark.table("curate_parity").collect().map(_.getLong(0)).toSet
    } finally q.stop()
    assert(got === streamed && got === Set(1L, 3L))
  }
}

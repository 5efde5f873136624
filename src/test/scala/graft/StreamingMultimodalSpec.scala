package graft

import graft.multimodal.MultimodalOps
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming tumbling window aggregates micro-batched events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, Long)]
    val events = input.toDF().toDF("ts_ts", "event_type", "value", "user_id")
    val q = StreamingOps.toMemorySink(
      StreamingOps.tumblingCounts(events), "tumbling_test", "update")
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0, 1L),
        (ts("2024-01-01 10:45:00"), "click", 2.0, 1L),
        (ts("2024-01-01 11:05:00"), "view", 3.0, 2L))
      q.processAllAvailable()
      val got = spark.table("tumbling_test")
        .select("window_start", "event_type", "cnt").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(got == Set(
        ("2024-01-01 10:00:00.0", "click", 2L),
        ("2024-01-01 11:00:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("streaming session window groups within gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, Long)]
    val events = input.toDF().toDF("ts_ts", "event_type", "value", "user_id")
    val q = StreamingOps.toMemorySink(
      StreamingOps.sessionCounts(events, gap = "10 minutes"), "session_test", "complete")
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
        (ts("2024-01-01 10:05:00"), "click", 1.0, 1L),   // same session
        (ts("2024-01-01 12:00:00"), "click", 1.0, 1L))   // new session
      q.processAllAvailable()
      val got = spark.table("session_test")
        .select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == Seq((1L, 1L), (1L, 2L)))
    } finally q.stop()
  }

  test("streaming CMS counter table equals the batch sketch over all arrivals") {
    import graft.operators.SketchOps
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val words = input.toDF().toDF("word")
    val q = StreamingOps.toMemorySink(
      StreamingOps.streamingCmsCounts(words, "word", 2, 16),
      "cms_test", "complete")
    try {
      input.addData("alpha", "alpha", "beta")
      q.processAllAvailable()
      input.addData("alpha", "gamma", "beta", "beta")   // second micro-batch
      q.processAllAvailable()
      val streamed = spark.table("cms_test")
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
      val batch = SketchOps.cmsBuild(
          Seq("alpha", "alpha", "beta", "alpha", "gamma", "beta", "beta")
            .map(Tuple1(_)).toDF("word"), "word", 2, 16)
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
      assert(streamed == batch)
      // and the batch lookup over the STREAMED table upper-bounds truth
      val est = SketchOps.cmsLookup(spark.table("cms_test"),
          Seq("alpha").map(Tuple1(_)).toDF("word"), "word", 2, 16)
        .collect().head.getLong(1)
      assert(est >= 3L)
    } finally q.stop()
  }

  test("streaming HLL register table equals the batch sketch over all arrivals") {
    import graft.operators.SketchOps
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val words = input.toDF().toDF("word")
    val q = StreamingOps.toMemorySink(
      StreamingOps.streamingHllRegisters(words, "word", 64),
      "hll_test", "complete")
    try {
      input.addData("alpha", "alpha", "beta")
      q.processAllAvailable()
      input.addData("alpha", "gamma", "beta", "delta")  // second micro-batch
      q.processAllAvailable()
      val streamed = spark.table("hll_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val batch = SketchOps.hllRegisters(
          Seq("alpha", "alpha", "beta", "alpha", "gamma", "beta", "delta")
            .map(Tuple1(_)).toDF("word"), "word", 64)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // and the batch estimator consumes the STREAMED table unchanged
      val est = SketchOps.hllEstimate(spark.table("hll_test"), 64)
        .collect().head.getDouble(3)
      assert(est > 0.0)
    } finally q.stop()
  }

  test("streaming heavy hitters emit once per closed window, below-threshold keys never") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts_ts", "key")
    val q = StreamingOps.toMemorySink(
      StreamingOps.streamingHeavyHitters(events, "key", minCount = 2L),
      "hh_test", "append")
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "a"),
        (ts("2024-01-01 10:15:00"), "a"),
        (ts("2024-01-01 10:25:00"), "b"),   // below threshold
        (ts("2024-01-01 10:35:00"), "a"))
      q.processAllAvailable()
      // append mode: nothing emits until the watermark closes 10:00-11:00
      assert(spark.table("hh_test").isEmpty)
      input.addData((ts("2024-01-01 12:30:00"), "c")) // advances watermark
      q.processAllAvailable()
      val got = spark.table("hh_test")
        .select("window_start", "key", "cnt").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(got == Set(("2024-01-01 10:00:00.0", "a", 3L)))
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the broadcast dim") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val stream = input.toDF().toDF("user_id", "value")
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = StreamingOps.toMemorySink(
      StreamingOps.enrichStream(stream, dim, "user_id"), "enrich_test", "append")
    try {
      input.addData((1L, 10.0), (3L, 30.0))
      q.processAllAvailable()
      input.addData((2L, 20.0)) // second micro-batch probes the dim again
      q.processAllAvailable()
      val got = spark.table("enrich_test")
        .collect().map(r => (r.getLong(0), Option(r.getString(2)))).toSet
      // left join: unknown user 3 passes through with a null tier
      assert(got == Set((1L, Some("gold")), (3L, None), (2L, Some("silver"))))
    } finally q.stop()
  }

  test("streaming sliding window counts events in overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, Long)]
    val events = input.toDF().toDF("ts_ts", "event_type", "value", "user_id")
    val q = StreamingOps.toMemorySink(
      StreamingOps.slidingCounts(events, "1 hour", "30 minutes"), "sliding_test", "update")
    try {
      input.addData((ts("2024-01-01 10:40:00"), "click", 1.0, 1L))
      q.processAllAvailable()
      val starts = spark.table("sliding_test")
        .select("window_start").collect().map(_.getTimestamp(0).toString).toSet
      // 1h window sliding 30min → event belongs to exactly 2 windows
      assert(starts == Set("2024-01-01 10:00:00.0", "2024-01-01 10:30:00.0"))
    } finally q.stop()
  }

  test("nanosToTimestamp converts epoch nanos to microsecond timestamps") {
    import graft.operators.EventOps
    val df = Seq(1704067207179575175L).toDF("ts")
      .select(EventOps.nanosToTimestamp(col("ts")).as("t"))
    assert(df.collect()(0).getTimestamp(0).toInstant.toString == "2024-01-01T00:00:07.179575Z")
  }

  test("streaming dedup within watermark drops duplicate keys") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, Long)]
    val events = input.toDF().toDF("ts_ts", "event_type", "value", "user_id")
    val q = StreamingOps.toMemorySink(
      StreamingOps.dedupWithinWatermark(events, Seq("user_id", "event_type")),
      "dedup_test", "append")
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
        (ts("2024-01-01 10:00:30"), "click", 9.0, 1L),   // dup key → dropped
        (ts("2024-01-01 10:01:00"), "view", 2.0, 1L))
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() == 2)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions by gap and emits once") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, Long)]
    val events = input.toDF().toDF("ts_ts", "event_type", "value", "user_id")
    val q = StreamingOps.toMemorySink(
      StreamingOps.sessionizeWithState(events, gapMinutes = 10),
      "fmgws_test", "append")
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
        (ts("2024-01-01 10:05:00"), "click", 1.0, 1L),   // extends session 1
        (ts("2024-01-01 12:00:00"), "click", 1.0, 2L))   // other user
      q.processAllAvailable()
      // user 1's next event is >10 min after 10:05 → closes session 1
      // in-stream (gap-break path); it also advances the watermark to
      // 12:50, past user 2's 12:10 timeout → session 2 emits via timeout
      input.addData((ts("2024-01-01 13:00:00"), "click", 1.0, 1L))
      q.processAllAvailable()
      val got = spark.table("fmgws_test")
        .select("user_id", "session_start", "session_end", "n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSet
      assert(got == Set(
        (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0", 2L),
        (2L, "2024-01-01 12:00:00.0", "2024-01-01 12:00:00.0", 1L)))
      // advancing the watermark far past every open session fires the
      // event-time timeouts → the remaining sessions emit exactly once
      input.addData((ts("2024-01-02 09:00:00"), "click", 1.0, 3L))
      q.processAllAvailable()
      val afterTimeout = spark.table("fmgws_test")
        .select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterTimeout == Set((1L, 2L), (1L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState session absorbs an allowed-late event without shrinking") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, Long)]
    val events = input.toDF().toDF("ts_ts", "event_type", "value", "user_id")
    val q = StreamingOps.toMemorySink(
      StreamingOps.sessionizeWithState(events, gapMinutes = 10),
      "fmgws_late_test", "append")
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
        (ts("2024-01-01 10:05:00"), "click", 1.0, 1L))
      q.processAllAvailable()
      // watermark is 09:55 — a 10:02 event is late but allowed; it must
      // JOIN the session without regressing its end bound (the bug was
      // endMs := t, which shrank the session and pulled the timeout in)
      input.addData((ts("2024-01-01 10:02:00"), "click", 1.0, 1L))
      q.processAllAvailable()
      // close the session in-stream via gap break
      input.addData((ts("2024-01-01 11:00:00"), "click", 1.0, 1L))
      q.processAllAvailable()
      val got = spark.table("fmgws_late_test")
        .select("user_id", "session_start", "session_end", "n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSet
      assert(got == Set(
        (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0", 3L)))
    } finally q.stop()
  }

  test("stream-stream interval join matches right rows within the window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, String, Double, Long)]
    val buys = MemoryStream[(Timestamp, String, Double, Long)]
    val l = clicks.toDF().toDF("ts_ts", "event_type", "value", "user_id")
    val r = buys.toDF().toDF("ts_ts", "event_type", "value", "user_id")
    val joined = StreamingOps.intervalJoin(l, r, "user_id", before = "30 minutes")
      .select(col("user_id"), col("event_type"), col("r_event_type"),
        col("r_ts_ts"))
    val q = StreamingOps.toMemorySink(joined, "interval_join_test", "append")
    try {
      buys.addData(
        (ts("2024-01-01 10:00:00"), "purchase", 9.99, 1L),   // in window
        (ts("2024-01-01 08:00:00"), "purchase", 1.0, 1L),    // too old
        (ts("2024-01-01 10:10:00"), "purchase", 5.0, 2L))    // other user
      clicks.addData((ts("2024-01-01 10:20:00"), "click", 0.0, 1L))
      q.processAllAvailable()
      val got = spark.table("interval_join_test").collect()
        .map(r0 => (r0.getLong(0), r0.getString(1), r0.getString(2),
          r0.getTimestamp(3).toString)).toSet
      assert(got == Set((1L, "click", "purchase", "2024-01-01 10:00:00.0")))
    } finally q.stop()
  }

  test("chunkedLoad drains a stream through foreachBatch exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, Long)]
    input.addData(
      (ts("2024-01-01 10:00:00"), "click", 1.0, 1L),
      (ts("2024-01-01 10:01:00"), "view", 2.0, 2L))
    val events = input.toDF().toDF("ts_ts", "event_type", "value", "user_id")
    val seen = new java.util.concurrent.atomic.AtomicLong()
    val cp = java.nio.file.Files.createTempDirectory("chunk_cp").toString
    val q = StreamingOps.chunkedLoad(events,
      (batch, _) => seen.addAndGet(batch.count()), cp).start()
    q.awaitTermination(30000)
    assert(seen.get() == 2L)
  }

  test("mapGroupsWithState accumulates per-user running stats across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val events = input.toDF().toDF("user_id", "value")
    val q = StreamingOps.runningUserStats(events).writeStream
      .format("memory").queryName("user_stats").outputMode("update").start()
    try {
      input.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
      q.processAllAvailable()
      input.addData((1L, 5.0))   // second batch: state must carry over
      q.processAllAvailable()
      val got = spark.table("user_stats")
        .groupBy("user_id").agg(max("n_events").as("n"), max("sum_value").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set((1L, 3L, 10.0), (2L, 1L, 10.0)))
    } finally q.stop()
  }

  test("typed Dataset API over curated movies") {
    import graft.etl.{MoviesEtl, TypedMovies}
    val result = MoviesEtl.extractTransformLoad(spark,
      fixture("wiki_movies.json"), fixture("movies_metadata.csv"), fixture("ratings.csv"))
    val ds = TypedMovies.typed(result.movies)
    assert(ds.count() == 8)
    val prof = TypedMovies.profitable(ds).collect().map(_.imdb_id).toSet
    assert(prof.contains("tt0000001"))      // revenue 123.4M > budget 20M
    assert(!prof.contains("tt0000012"))     // revenue 0.5M > budget null → false
    assert(TypedMovies.totalRuntimeHours(ds) > 0)
  }

  test("multimodal: feature extraction over binary payloads") {
    val media = MultimodalOps.fromBytes(spark, Seq(
      (1L, Array[Byte](0, 0, 0, 0), "image", "png"),      // all bytes in bin 0
      (2L, Array[Byte](-1, -1), "image", "png"),           // 0xFF → bin 15
      (3L, null, "image", "png")))
    val feats = MultimodalOps.extractFeatures(media).orderBy("media_id").collect()
    assert(feats(0).getLong(1) == 4L)
    assert(feats(0).getSeq[Double](2).head == 1.0)          // bin 0 = 100%
    assert(feats(1).getSeq[Double](2)(15) == 1.0)           // bin 15 = 100%
    assert(feats(2).isNullAt(1) && feats(2).isNullAt(2))    // null passthrough
  }

  test("multimodal: binaryFile datasource ingests a media directory end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "a.png").toPath,
        Array[Byte](1, 2, 3, 4))
      java.nio.file.Files.write(new java.io.File(dir, "b.PNG").toPath,
        Array[Byte](5, 6))
      val media = MultimodalOps.fromBinaryFiles(spark, dir.getAbsolutePath, "image")
      val rows = media.orderBy("path").collect()
      assert(rows.length == 2)
      assert(rows.forall(_.getStruct(3).getString(0) == "image"))
      assert(rows.map(_.getStruct(3).getString(1)).toSeq == Seq("png", "png"))
      // ids are deterministic path hashes and unique
      assert(rows.map(_.getLong(0)).distinct.length == 2)
      // the ingested frame feeds the standard feature pipeline unchanged
      val feats = MultimodalOps.extractFeatures(media)
        .orderBy("n_bytes").collect()
      assert(feats.map(_.getLong(1)).toSeq == Seq(2L, 4L))
    } finally {
      dir.listFiles.foreach(_.delete()); dir.delete()
    }
  }

  test("multimodal: resize stub updates metadata and payload in lockstep") {
    val media = MultimodalOps.fromBytes(spark,
      Seq((1L, Array.fill[Byte](100)(7), "image", "png")))
    val out = MultimodalOps.resizeStub(media, 4, 4).collect()(0)
    assert(out.getAs[Array[Byte]]("payload").length == 16)
    val meta = out.getStruct(2)
    assert(meta.getInt(2) == 4 && meta.getInt(3) == 4)
  }

  test("multimodal: a REAL PNG decodes to true dimensions and pixel features") {
    import graft.multimodal.ImageCodec
    // 8×6 synthetic PNG: left half black, right half white — generated
    // in-memory by the JRE encoder, decoded by the REAL ImageCodec path
    val png = ImageCodec.encodePng(8, 6, (x, _) => if (x < 4) 0x000000 else 0xFFFFFF)
    val media = MultimodalOps.fromBytes(spark, Seq(
      (1L, png, "image", "png"),
      (2L, Array[Byte](9, 9, 9, 9), "image", "jpg")))  // no JVM path → stub
    val feats = MultimodalOps.extractFeatures(media).orderBy("media_id").collect()
    // true decoded dimensions, not metadata echoes
    assert(feats(0).getInt(3) == 8 && feats(0).getInt(4) == 6)
    val hist = feats(0).getSeq[Double](2)
    // half the pixels are luminance 0 (bin 0), half 255 (bin 15)
    assert(math.abs(hist.head - 0.5) < 1e-12 && math.abs(hist(15) - 0.5) < 1e-12)
    // opaque format keeps the byte-histogram stub and null dims
    assert(feats(1).isNullAt(3) && feats(1).isNullAt(4))
    assert(feats(1).getSeq[Double](2)(0) == 1.0)  // bytes 9,9,9,9 → bin 0
  }

  test("multimodal: resizeImages really rescales PNG pixels, passes opaque through") {
    import graft.multimodal.ImageCodec
    val png = ImageCodec.encodePng(8, 6, (x, _) => if (x < 4) 0x000000 else 0xFFFFFF)
    val opaque = Array[Byte](1, 2, 3)
    val media = MultimodalOps.fromBytes(spark, Seq(
      (1L, png, "image", "png"), (2L, opaque, "image", "jpg")))
    val out = MultimodalOps.resizeImages(media, 4, 3).orderBy("media_id").collect()
    // round-trip the resized payload through the decoder: true new dims,
    // and nearest-neighbor keeps the half-black/half-white structure
    val back = ImageCodec.decode(out(0).getAs[Array[Byte]]("payload")).get
    assert(back.width == 4 && back.height == 3)
    assert(math.abs(back.lumaHistogram(0) - 0.5) < 1e-12 &&
      math.abs(back.lumaHistogram(15) - 0.5) < 1e-12)
    assert(out(0).getStruct(2).getInt(2) == 4 && out(0).getStruct(2).getInt(3) == 3)
    // non-decodable: original bytes untouched, dims stay null
    assert(out(1).getAs[Array[Byte]]("payload").toSeq == opaque.toSeq)
    assert(out(1).getStruct(2).isNullAt(2) && out(1).getStruct(2).isNullAt(3))
  }

  test("multimodal: a REAL PCM WAV decodes to true rate/duration and amplitude features") {
    import graft.multimodal.AudioCodec
    // 8 kHz mono, 2000 frames = 250 ms: half the samples at −16384
    // (bin (−16384+32768)>>12 = 4), half at +16384 (bin 12)
    val samples = Array.tabulate[Short](2000)(i =>
      if (i % 2 == 0) (-16384).toShort else 16384.toShort)
    val wav = AudioCodec.encodeWavPcm16(8000, 1, samples)
    val decoded = AudioCodec.decode(wav).get
    assert(decoded.sampleRate == 8000 && decoded.channels == 1 &&
      decoded.bitsPerSample == 16 && decoded.nFrames == 2000L &&
      decoded.durationMs == 250L)
    assert(math.abs(decoded.amplitudeHistogram(4) - 0.5) < 1e-12 &&
      math.abs(decoded.amplitudeHistogram(12) - 0.5) < 1e-12)

    // through the standard feature pipeline: true duration, null dims
    val media = MultimodalOps.fromBytes(spark, Seq(
      (1L, wav, "audio", "wav"),
      (2L, Array[Byte](9, 9, 9, 9), "audio", "mp3")))  // no JVM path → stub
    val feats = MultimodalOps.extractFeatures(media).orderBy("media_id").collect()
    assert(feats(0).getLong(5) == 250L)
    assert(feats(0).isNullAt(3) && feats(0).isNullAt(4))
    assert(math.abs(feats(0).getSeq[Double](2)(4) - 0.5) < 1e-12)
    assert(feats(1).isNullAt(5))                    // opaque: stub, no duration
    assert(feats(1).getSeq[Double](2)(0) == 1.0)    // bytes 9,9,9,9 → bin 0
  }

  test("multimodal: stereo and 8-bit WAVs decode; corrupt WAVs fall back to the stub") {
    import graft.multimodal.AudioCodec
    // stereo: 1000 interleaved L/R frames at 44100 Hz → 22 ms (integer div)
    val stereo = AudioCodec.encodeWavPcm16(44100, 2,
      Array.fill[Short](2000)(0))
    val d = AudioCodec.decode(stereo).get
    assert(d.channels == 2 && d.nFrames == 1000L && d.durationMs == 22L)
    assert(d.amplitudeHistogram(8) == 1.0)   // silence → bin (0+32768)>>12 = 8

    // 8-bit unsigned path, hand-built: 4 samples 0x00,0x10,0xF0,0xFF
    val hdr = AudioCodec.encodeWavPcm16(8000, 1, Array[Short](0, 0))
    val eightBit = hdr.clone()
    eightBit(34) = 8                          // bits per sample
    eightBit(32) = 1; eightBit(33) = 0        // block align = 1
    eightBit(40) = 4                          // data size = 4 bytes
    eightBit(44) = 0x00; eightBit(45) = 0x10
    eightBit(46) = 0xF0.toByte; eightBit(47) = 0xFF.toByte
    val d8 = AudioCodec.decode(eightBit).get
    assert(d8.bitsPerSample == 8 && d8.nFrames == 4L)
    assert(d8.amplitudeHistogram(0) == 0.25 && d8.amplitudeHistogram(1) == 0.25 &&
      d8.amplitudeHistogram(15) == 0.5)

    // corrupt: data chunk declares more bytes than the payload carries
    val truncated = AudioCodec.encodeWavPcm16(8000, 1, Array.fill[Short](100)(1))
      .dropRight(50)
    assert(AudioCodec.decode(truncated).isEmpty)
    // non-PCM format code rejects
    val alaw = AudioCodec.encodeWavPcm16(8000, 1, Array[Short](0, 0)).clone()
    alaw(20) = 6
    assert(AudioCodec.decode(alaw).isEmpty)
    // and the feature pipeline keeps flowing on the stub path
    val media = MultimodalOps.fromBytes(spark, Seq((1L, truncated, "audio", "wav")))
    val feats = MultimodalOps.extractFeatures(media).collect()
    assert(feats(0).isNullAt(5) && !feats(0).isNullAt(2))
  }

  test("multimodal: frame sampling explodes video rows only") {
    val media = MultimodalOps.fromBytes(spark, Seq(
      (1L, Array[Byte](1), "video", "mp4"),
      (2L, Array[Byte](1), "image", "png")))
    val frames = MultimodalOps.sampleFrames(media, 2500L)
    // duration 10000ms sampled every 2500ms → ts 0,2500,5000,7500,10000
    assert(frames.count() == 5)
    assert(frames.select("media_id").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}

package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-6 coverage: unit tests for the six late-round-5 operators that
  * previously had only the external oracle compare (ADVICE r5), the new
  * prefix-filtered containment, and the JPEG codec.
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- transitionCounts ----------------

  test("transitionCounts counts ordered per-user event-type transitions") {
    val events = Seq(
      // user 1: A → B → A  (ts in ns; ordering key is ts div 1000)
      (1L, 1_000_000L, 1L, "A", 0.0),
      (1L, 2_000_000L, 2L, "B", 0.0),
      (1L, 3_000_000L, 3L, "A", 0.0),
      // user 2: B → B
      (2L, 1_000_000L, 4L, "B", 0.0),
      (2L, 2_000_000L, 5L, "B", 0.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = EventOps.transitionCounts(events)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("A", "B", 1L), ("B", "A", 1L), ("B", "B", 1L)))
  }

  test("transitionCounts: a single-event user contributes no transition") {
    val events = Seq((1L, 1_000_000L, 1L, "A", 0.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    assert(EventOps.transitionCounts(events).count() == 0L)
  }

  // ---------------- timeWeightedValue ----------------

  test("timeWeightedValue weights each reading by its holding interval") {
    // user 1: 10.00 held 1000 µs, 20.00 held 2000 µs, final reading open
    // → Σ(v_c·dt) = 1000·1000 + 2000·2000 = 5e6; Σdt = 3000 → 1666 cents
    val events = Seq(
      (1L, 0L, 1L, "x", 10.0),
      (1L, 1_000_000L, 2L, "x", 20.0),
      (1L, 3_000_000L, 3L, "x", 30.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = EventOps.timeWeightedValue(events).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) == 3000L)
    assert(r.getLong(3) == 1666L)
  }

  test("timeWeightedValue drops zero-span users (no 0/0)") {
    val events = Seq(
      (7L, 5_000_000L, 1L, "x", 1.0),
      (7L, 5_000_000L, 2L, "x", 2.0))  // same µs timestamp → zero weight
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    assert(EventOps.timeWeightedValue(events).count() == 0L)
  }

  // ---------------- paretoFrontier ----------------

  test("paretoFrontier keeps exactly the non-dominated planted points") {
    val pts = Seq((1L, 5L), (2L, 3L), (3L, 7L), (4L, 7L)).toDF("x", "y")
    val got = Relational.paretoFrontier(pts, "x", "y")
      .orderBy("x").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 5L), (3L, 7L)))
  }

  test("paretoFrontier collapses duplicate x to max(y) instead of a wrong skyline") {
    // pre-round-6 the duplicate x=1 rows hit the running max in arbitrary
    // tie order: (1,5) before (1,9) let (1,9) "dominate into" the frontier
    // twice or drop (2,8) depending on sort stability — now ties collapse
    // first, so the result is the skyline of {(1,9),(2,8)}
    val pts = Seq((1L, 5L), (1L, 9L), (2L, 8L)).toDF("x", "y")
    val got = Relational.paretoFrontier(pts, "x", "y")
      .orderBy("x").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 9L)))
  }

  // ---------------- vocabCoverage ----------------

  test("vocabCoverage reports the first rank reaching each threshold") {
    // counts: a=4, b=2, c=1 (total 7); cum: 4, 6, 7
    val docs = Seq((1L, "a a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextOps.vocabCoverage(docs, Seq(500000L, 900000L, 1000000L), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (500000L, 1L, 4L, 7L),    // 4/7 ≥ 50%
      (900000L, 3L, 7L, 7L),    // 6/7 < 90% → needs rank 3
      (1000000L, 3L, 7L, 7L)))
  }

  test("vocabCoverage: a threshold unreachable within maxRank yields no row") {
    val docs = Seq((1L, "a a a b"), (2L, "a b c")).toDF("doc_id", "text")
    // maxRank 2 caps cumulative coverage at 6/7 < 100%
    val got = TextOps.vocabCoverage(docs, Seq(1000000L), 2).collect()
    assert(got.isEmpty)
  }

  // ---------------- containmentPairs + containmentPairsPrefix ----------------

  private val contDocs = Seq(
    (1L, "a b c d e f g h i j"),  // 10 words
    (2L, "a b c d e f g h i k"),  // 9/10 shared with doc 1 → 90% both ways
    (3L, "a b c"))                // quote: 100% inside docs 1 and 2
    .toDF("doc_id", "text")

  test("containmentPairs finds the quote-inside-page pair Jaccard misses") {
    val got = DedupOps.containmentPairs(contDocs, 90)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSet
    assert(got == Set(
      (1L, 2L, 900000L), (2L, 1L, 900000L),
      (3L, 1L, 1000000L), (3L, 2L, 1000000L)))
    // the quote pair's Jaccard is 3/10 — far below the 90% bar
    assert(DedupOps.jaccardPairs(contDocs.filter(col("doc_id") =!= 2L), 90)
      .count() == 0L)
  }

  test("containmentPairsPrefix is row-identical to the full inverted-index join") {
    val full = DedupOps.containmentPairs(contDocs, 90).collect().toSeq
    val pref = DedupOps.containmentPairsPrefix(contDocs, 90).collect().toSeq
    assert(pref == full)
  }

  test("containmentPairsPrefix matches on the sf0.001 declared slice") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(pmod(col("doc_id"), lit(10)) === 0)
    val full = DedupOps.containmentPairs(docs, 90).collect().toSeq
    val pref = DedupOps.containmentPairsPrefix(docs, 90).collect().toSeq
    assert(full.nonEmpty, "vacuous slice — no containment pairs to compare")
    assert(pref == full)
  }

  test("containmentPairsPrefix: t=100 probes only the single rarest token") {
    // exact-duplicate word sets must still pair at the 100% threshold
    // (prefix length collapses to 1)
    val docs = Seq((1L, "p q r"), (2L, "r q p"), (3L, "p q")).toDF("doc_id", "text")
    val got = DedupOps.containmentPairsPrefix(docs, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 1L), (3L, 1L), (3L, 2L)))
  }

  // ---------------- dedupAgainstCorpus ----------------

  test("dedupAgainstCorpus flags the batch doc duplicated in the corpus") {
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "entirely novel content nothing like the corpus")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),  // exact word set
      (2L, "some other corpus document")).toDF("doc_id", "text")
    val got = DedupOps.dedupAgainstCorpus(batch, corpus, 12, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(100L) == 1L)
    assert(got(101L) == 0L)
  }

  // ---------------- JPEG codec ----------------

  test("multimodal: a REAL JPEG decodes to true dimensions; corrupt JPEG falls back") {
    import graft.multimodal.{ImageCodec, MultimodalOps}
    val jpeg = ImageCodec.encodeJpeg(12, 10, (x, _) => if (x < 6) 0x000000 else 0xFFFFFF)
    // a JPEG signature on garbage bytes must fall back to the stub path
    val corrupt = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 1, 2, 3)
    val media = MultimodalOps.fromBytes(spark, Seq(
      (1L, jpeg, "image", "jpg"), (2L, corrupt, "image", "jpg")))
    val feats = MultimodalOps.extractFeatures(media).orderBy("media_id").collect()
    // true decoded dimensions from the real javax.imageio JPEG reader
    assert(feats(0).getInt(3) == 12 && feats(0).getInt(4) == 10)
    val hist = feats(0).getSeq[Double](2)
    assert(math.abs(hist.sum - 1.0) < 1e-9)
    // JPEG is lossy: assert histogram MASS at the extremes, not exact bins
    assert(hist.head + hist(1) > 0.35 && hist(15) + hist(14) > 0.35)
    // corrupt payload: stub features, null dims — batch not poisoned
    assert(feats(1).isNullAt(3) && feats(1).isNullAt(4))
    assert(math.abs(feats(1).getSeq[Double](2).sum - 1.0) < 1e-9)
  }

  test("multimodal: resizeImages rescales a JPEG and re-encodes losslessly") {
    import graft.multimodal.{ImageCodec, MultimodalOps}
    val jpeg = ImageCodec.encodeJpeg(8, 6, (x, _) => if (x < 4) 0x000000 else 0xFFFFFF)
    val media = MultimodalOps.fromBytes(spark, Seq((1L, jpeg, "image", "jpg")))
    val out = MultimodalOps.resizeImages(media, 4, 3).collect()(0)
    val back = ImageCodec.decode(out.getAs[Array[Byte]]("payload")).get
    assert(back.width == 4 && back.height == 3)
    assert(out.getStruct(2).getInt(2) == 4 && out.getStruct(2).getInt(3) == 3)
  }
}

package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-5 operators: bloom-prefiltered semi-join, exact z-score outlier
  * filter, word co-occurrence, passage-level dedup, temperature-sampled
  * language weights.
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- bloomPrefilteredSemiJoin ----------------

  test("bloom semi-join is row-identical to the plain semi-join") {
    val probe = (1L to 200L).map(i => (i, s"p$i")).toDF("k", "payload")
    val build = Seq(3L, 7L, 50L, 199L, 3L).toDF("bk") // dup key on purpose
    val got = Relational
      .bloomPrefilteredSemiJoin(probe, build, "k", "bk")
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 7L, 50L, 199L)) // dup build key ≠ dup output row
  }

  test("bloom semi-join stays exact even when tiny mBits forces false positives") {
    // 64 bits for 40 keys × 3 hashes ⇒ the filter is saturated with false
    // positives — the verify join must still produce the exact result
    val probe = (1L to 500L).toDF("k")
    val build = (1L to 40L).map(_ * 13L).toDF("bk")
    val expected = probe.join(build.select(col("bk").as("k")), Seq("k"), "left_semi")
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    val got = Relational
      .bloomPrefilteredSemiJoin(probe, build, "k", "bk", mBits = 64)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got == expected)
  }

  test("bloom pre-filter alone prunes nearly all non-members before the join") {
    val probe = (1L to 10000L).toDF("k")
    val build = Seq(1L, 2L, 3L).toDF("bk")
    val pruned = Relational.bloomPrunedProbe(probe, build, "k", "bk").count()
    // all 3 true members MUST survive (no false negatives); at 2^16 bits /
    // 3 keys the false-positive rate is ~1e-13, so in practice exactly 3
    // rows remain — allow a loose margin rather than pin the hash
    assert(pruned >= 3L && pruned <= 20L,
      s"bloom prune left $pruned of 10000 rows (expected ~3)")
    assert(Relational.bloomPrefilteredSemiJoin(probe, build, "k", "bk")
      .count() == 3L)
  }

  // ---------------- zscoreOutliers ----------------

  test("zscoreOutliers flags the planted extreme value and nothing uniform") {
    // group A: 99 × 10.00 plus one 10000.00 → the spike is >> 3σ;
    // group B: perfectly uniform → σ = 0, nothing can exceed 3σ
    val a = (1L to 99L).map(i => (i, "A", 10.0)) :+ (100L, "A", 10000.0)
    val b = (101L to 150L).map(i => (i, "B", 42.0))
    val events = (a ++ b).toDF("ts", "event_type", "value")
    val out = EventOps.zscoreOutliers(events, 3).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("event_type") == "A")
    assert(out.head.getAs[Long]("ts_ns") == 100L)
    assert(out.head.getAs[Long]("value_c") == 1000000L)
    assert(out.head.getAs[Long]("group_n") == 100L)
  }

  test("zscoreOutliers: all-equal group yields zero outliers (σ = 0 edge)") {
    val events = (1L to 10L).map(i => (i, "X", 5.0)).toDF("ts", "event_type", "value")
    assert(EventOps.zscoreOutliers(events, 3).count() == 0L)
  }

  // ---------------- cooccurrence ----------------

  test("cooccurrence emits forward-window pairs with exact counts") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val got = TextOps.cooccurrence(docs, 2, 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // window 2: pairs (a,b),(a,c),(b,c),(b,d),(c,d)
    assert(got == Set(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L),
      ("b", "d", 1L), ("c", "d", 1L)))
  }

  test("cooccurrence counts repeats and breaks top-N ties deterministically") {
    val docs = Seq((1L, "x y x y")).toDF("doc_id", "text")
    // window 1: (x,y), (y,x), (x,y) → cnt 2 for (x,y), 1 for (y,x)
    val got = TextOps.cooccurrence(docs, 1, 1).collect()
    assert(got.length == 1)
    assert((got.head.getString(0), got.head.getString(1), got.head.getLong(2))
      == ("x", "y", 2L))
  }

  test("cooccurrence: single-word doc contributes nothing") {
    val docs = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    assert(TextOps.cooccurrence(docs, 3, 10).count() == 1L)
  }

  // ---------------- passageDedup ----------------

  test("passageDedup keeps the corpus-first passage and counts later copies as dups") {
    val docs = Seq(
      (1L, "x y z w"),  // passages: "x y", "z w"
      (2L, "x y q r"),  // "x y" is a dup of doc 1's first passage
      (3L, "z w"))      // dup of doc 1's second passage
      .toDF("doc_id", "text")
    val got = DedupOps.passageDedup(docs, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 0L, 2L), (2L, 2L, 1L, 1L), (3L, 1L, 1L, 0L)))
  }

  test("passageDedup: short final passage participates like any other") {
    val docs = Seq((1L, "a b c"), (2L, "c")).toDF("doc_id", "text")
    // doc 1: "a b", "c"; doc 2: "c" — duplicate of doc 1's trailing short passage
    val got = DedupOps.passageDedup(docs, 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L))
  }

  test("passageDedup: duplicate inside ONE document counts too (intra-doc dup)") {
    val docs = Seq((5L, "a b a b")).toDF("doc_id", "text")
    val got = DedupOps.passageDedup(docs, 2).collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((2L, 1L, 1L)))
  }

  // ---------------- languageSamplingWeights ----------------

  test("languageSamplingWeights: sqrt-temperature flattens the head") {
    val docs = (1L to 4L).map(i => (i, "en")) :+ (5L -> "fr")
    val df = docs.toDF("doc_id", "lang")
    val got = TextOps.languageSamplingWeights(df)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sqrt(4)·10⁶ = 2_000_000, sqrt(1)·10⁶ = 1_000_000; total 3_000_000
    // en: 2e6·1e6 div 3e6 = 666_666; fr: 333_333
    assert(got.toSeq == Seq(("en", 4L, 2000000L, 666666L),
      ("fr", 1L, 1000000L, 333333L)))
    // raw share would be 800_000 / 200_000 — the temperature upsamples fr
    assert(got(1)._4 > 200000L && got(0)._4 < 800000L)
  }

  test("languageSamplingWeights: equal counts → equal weights") {
    val docs = Seq((1L, "de"), (2L, "es")).toDF("doc_id", "lang")
    val w = TextOps.languageSamplingWeights(docs)
      .collect().map(_.getLong(3)).toSet
    assert(w == Set(500000L))
  }
}

package graft

import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-12 operators: LSH corpus-index maintenance (VERDICT r11 #3).
  * The declared q_dedup_index_upsert hash-checks flag-decision parity
  * through DuckDB; this spec pins the stronger relation-level contract
  * those decisions derive from — the upserted index equals a
  * from-scratch rebuild ROW FOR ROW — plus the helper prober's parity
  * with its raw-corpus twin.
  */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  private val nh = 16
  private val rpb = 2

  private val corpus = Seq(
    (100L, "alpha beta gamma delta epsilon"),
    (101L, "one two three four five"),
    (102L, "red green blue yellow purple"))
    .toDF("doc_id", "text")

  // doc 101 re-crawled (same id, new text — the supersede case), doc
  // 200 brand-new
  private val accepted = Seq(
    (101L, "one two three four updated fresh"),
    (200L, "wholly new accepted document words"))
    .toDF("doc_id", "text")

  private def rebuiltCorpus: DataFrame =
    corpus.filter(col("doc_id") =!= 101L).unionByName(accepted)

  private def assertSameRows(got: DataFrame, want: DataFrame, what: String): Unit = {
    assert(got.exceptAll(want).count() === 0L, s"$what: extra rows in upsert")
    assert(want.exceptAll(got).count() === 0L, s"$what: missing rows in upsert")
  }

  test("indexUpsert band relation equals a from-scratch rebuild (supersede included)") {
    val (bands, sets) = DedupOps.indexUpsert(
      DedupOps.corpusBandDocs(corpus, nh, rpb),
      DedupOps.corpusHashedSets(corpus), accepted, nh, rpb)
    assertSameRows(bands, DedupOps.corpusBandDocs(rebuiltCorpus, nh, rpb), "bands")
    assertSameRows(sets, DedupOps.corpusHashedSets(rebuiltCorpus), "sets")
    // the supersede path actually bit: the OLD 101 bands are gone
    val old101 = DedupOps.corpusBandDocs(corpus, nh, rpb)
      .filter(col("corpus_id") === 101L)
    assert(bands.filter(col("corpus_id") === 101L).exceptAll(old101).count() > 0L,
      "updated 101 must carry NEW bands")
    assert(old101.exceptAll(bands.filter(col("corpus_id") === 101L)).count() > 0L,
      "stale 101 bands must be dropped")
  }

  test("dedupAgainstIndex equals dedupAgainstCorpus on the same corpus state") {
    val probe = Seq(
      (1L, "alpha beta gamma delta zeta"),
      (2L, "totally unrelated fresh words here"),
      (3L, "one two three four six"))
      .toDF("doc_id", "text")
    val viaIndex = DedupOps.dedupAgainstIndex(probe,
      DedupOps.corpusBandDocs(corpus, nh, rpb), nh, rpb).collect().toSeq
    val viaCorpus = DedupOps.dedupAgainstCorpus(probe, corpus, nh, rpb)
      .collect().toSeq
    assert(viaIndex === viaCorpus)
    // non-vacuous fixture: both flag classes present
    assert(viaIndex.map(_.getLong(1)).toSet === Set(0L, 1L))
  }

  test("q_lsh_calibration pins the production configs' recall claims") {
    val rows = Queries.queries("q_lsh_calibration")(spark, "unused")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)) -> r.getLong(5))
      .toMap
    // the q_neardup_lsh_verified/32x2 comment claims per-pair miss
    // ~8e-8 at j >= 0.8 — below ppm resolution, so the calibrated
    // catch saturates
    assert(rows((32L, 2L, 800000L)) === 1000000L)
    // q_minhash_lsh's 12x3 config is the high-τ/low-cost knee: strong
    // at 80%, deliberately weak at 50%
    assert(rows((12L, 3L, 800000L)) > 940000L)
    assert(rows((12L, 3L, 500000L)) < 500000L)
    // monotone in bands at fixed r: more bands can only help recall
    assert(rows((32L, 2L, 500000L)) > rows((16L, 2L, 500000L)))
  }

  test("upsert changes later decisions exactly as a rebuild does") {
    // doc 300 near-dups ACCEPTED doc 200 (5/7 shared words = 71%) —
    // invisible to the pre-upsert index, flagged by the post-upsert one.
    val probe = Seq((300L, "wholly new accepted document words plus extra"))
      .toDF("doc_id", "text")
    val before = DedupOps.dedupAgainstIndex(probe,
      DedupOps.corpusBandDocs(corpus, nh, rpb), nh, rpb)
      .collect()(0).getLong(1)
    val (bands, _) = DedupOps.indexUpsert(
      DedupOps.corpusBandDocs(corpus, nh, rpb),
      DedupOps.corpusHashedSets(corpus), accepted, nh, rpb)
    val after = DedupOps.dedupAgainstIndex(probe, bands, nh, rpb)
      .collect()(0).getLong(1)
    assert(before === 0L && after === 1L)
  }
}

package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** Round-15 third wave: the corpus-wide kNN-graph family. The declared
  * keys (q_knn_join / q_knn_label / q_knn_mutual_cc) hash-check the
  * candidate/ranking/vote/cluster relations against DuckDB replays; this
  * spec pins the engine properties the oracle replay can't distinguish
  * from coincidence: graph well-formedness (no self edges, dense ranks,
  * monotone scores), a recall floor against the exact brute-force top-k
  * (the bucketed candidates must actually FIND near neighbors, not just
  * rank whatever fell in the bucket), and the mutuality semantics of the
  * cluster edges.
  */
class Round15cOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val probes = (0L until 8L)

  test("knnGraphExact is a well-formed graph: no self edges, ranks dense " +
    "from 1, scores non-increasing within a vector") {
    val g = SimilarityOps.knnGraphExact(Tables.embeddings(spark, sf),
      probes, k = 3).collect()
    assert(g.nonEmpty)
    assert(g.forall(r => r.getAs[Long]("q_id") != r.getAs[Long]("n_id")))
    val byQ = g.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rn"))
      assert(sorted.map(_.getAs[Long]("rn")).toSeq ==
        (1L to sorted.length).toSeq, s"ranks not dense for q=$q")
      val scores = sorted.map(_.getAs[Long]("score_s14")).toSeq
      assert(scores == scores.sorted(Ordering[Long].reverse),
        s"scores not monotone for q=$q")
    }
  }

  // Floor calibration: the fixture embeddings are ISOTROPIC (labels are
  // random w.r.t. the space — exact-kNN majority accuracy measured 9.4%
  // ≈ the 1/10 random baseline), the hardest case for sign-LSH. A
  // hamming≤1 probe of 8 planes visits 9/256 ≈ 3.5% of buckets, so a
  // SIMILARITY-BLIND bucketing would recall ~3.5%; measured recall is
  // 12.7% — the floor sits at 8%, above broken, below measured noise.
  test("knnGraphExact recall vs exact brute-force top-3 beats the " +
    "similarity-blind bucket baseline (>= 8%)") {
    val emb = Tables.embeddings(spark, sf)
    val g = SimilarityOps.knnGraphExact(emb, probes, k = 3)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact top-4 per vector over ALL vectors, self dropped -> top-3
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = SimilarityOps.topKDotExact(emb, ids, k = 4)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (q, n) => q != n }
      .groupBy(_._1).iterator.flatMap(_._2.take(3)).toSet
    val hits = exact.count(g.contains)
    assert(hits * 100 >= exact.size * 8,
      s"kNN-graph recall ${hits}/${exact.size} below the 8% floor")
  }

  test("mutualKnnClusters: mutual edges share a cluster, every vector " +
    "appears exactly once, non-mutual pairs do not merge by themselves") {
    val emb = Tables.embeddings(spark, sf)
    val labels = SimilarityOps.mutualKnnClusters(emb, probes, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = emb.count()
    assert(labels.size == n, "one cluster row per vector")
    assert(labels.forall { case (v, c) => c <= v },
      "cluster_id is the component minimum")
    val g = SimilarityOps.knnGraphExact(emb, probes, k = 3)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = g.filter { case (q, nb) => q < nb && g.contains((nb, q)) }
    assert(mutual.nonEmpty, "fixture produces at least one mutual edge")
    mutual.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"mutual edge ($a,$b) split") }
    // a hub edge that is NOT reciprocated must not merge the endpoints
    // unless some mutual path connects them; verify at least one such
    // non-mutual edge exists with endpoints in different clusters
    // (k=3 on this fixture has asymmetric edges by construction)
    val nonMutualSplit = g.exists { case (q, nb) =>
      !g.contains((nb, q)) && labels(q) != labels(nb) }
    assert(nonMutualSplit,
      "expected at least one non-reciprocated edge across clusters")
  }

  test("knnLabelVote: votes bounded by k, correct flag consistent, and " +
    "the vote equals a local majority recount over the graph's own " +
    "neighbor set") {
    val emb = Tables.embeddings(spark, sf)
    val out = SimilarityOps.knnLabelVote(emb, probes, k = 5).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("votes") >= 1 &&
      r.getAs[Long]("votes") <= 5))
    assert(out.forall(r => r.getAs[Boolean]("correct") ==
      (r.getAs[Long]("pred_label") == r.getAs[Long]("true_label"))))
    // independent recount: collect the graph + labels, redo the
    // majority (ties to the smaller label) driver-side
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val byQ = SimilarityOps.knnGraphExact(emb, probes, k = 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
    out.foreach { r =>
      val q = r.getAs[Long]("vec_id")
      val counts = byQ(q).map(p => labels(p._2))
        .groupBy(identity).map { case (l, v) => (l, v.length.toLong) }
      val (expLabel, expVotes) =
        counts.toSeq.sortBy { case (l, v) => (-v, l) }.head
      assert(r.getAs[Long]("pred_label") == expLabel &&
        r.getAs[Long]("votes") == expVotes,
        s"vote mismatch for q=$q")
    }
  }
}

package graft

import graft.operators.RetrievalOps
import org.apache.spark.sql.functions._

/** Round-15 wave-4 lexical-retrieval engine pins. The declared keys
  * (q_bm25_topk / q_rank_fusion) hash-check the full relations against
  * DuckDB; this spec pins the RANKING SEMANTICS on constructed corpora
  * where the right answer is known a priori: BM25's tf saturation and
  * idf ordering, and RRF's consensus behavior (a document ranked by
  * both retrievers beats one ranked by a single retriever at comparable
  * positions).
  */
class RetrievalOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("bm25TopK: tf grows the score strictly but sublinearly " +
    "(saturation), and rare terms outweigh common ones") {
    // filler docs give 'common' a high df; 'rare' appears in one doc
    val corpus = docs(
      1L -> "rare common pad pad",
      2L -> ("rare rare rare rare rare rare rare rare " +
        "rare rare rare rare rare rare rare rare"),
      3L -> "common pad pad pad",
      4L -> "common pad pad pad",
      5L -> "common pad pad pad")
    val out = RetrievalOps.bm25TopK(corpus,
      Seq("q" -> Seq("rare", "common")), k = 5).collect()
    val score = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("score_ppm")).toMap
    // tf=16 beats tf=1 on the rare term...
    assert(score(2L) > score(1L))
    // ...but nowhere near 16x: BM25 saturates (k1=1.2 caps the tf
    // factor at 2.2x the tf=1 numerator scale)
    assert(score(2L) < 4L * score(1L),
      s"tf=16 score ${score(2L)} not saturated vs tf=1 ${score(1L)}")
    // the rare+common doc beats common-only docs
    assert(score(1L) > score(3L))
    // ranks are dense from 1 and scores non-increasing
    val sorted = out.sortBy(_.getAs[Long]("rn"))
    assert(sorted.map(_.getAs[Long]("rn")).toSeq ==
      (1L to sorted.length).toSeq)
    val ss = sorted.map(_.getAs[Long]("score_ppm")).toSeq
    assert(ss == ss.sorted(Ordering[Long].reverse))
  }

  test("bm25TopK: longer documents are penalized at equal tf (the b " +
    "length normalization)") {
    val corpus = docs(
      1L -> "term pad",
      2L -> ("term pad pad pad pad pad pad pad pad pad pad pad pad " +
        "pad pad pad pad pad pad pad pad pad pad pad"),
      3L -> "pad filler other words")
    val out = RetrievalOps.bm25TopK(corpus, Seq("q" -> Seq("term")), k = 3)
      .collect()
    val score = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("score_ppm")).toMap
    assert(score(1L) > score(2L),
      s"short doc ${score(1L)} must outrank long doc ${score(2L)} at tf=1")
  }

  test("rrfFuse: consensus wins — a doc in both rankers' lists beats " +
    "single-ranker docs at comparable ranks; absent docs contribute 0") {
    import spark.implicits._
    val r1 = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("q_id", "doc_id", "rank")
    val r2 = Seq((0L, 10L, 2L), (0L, 13L, 1L), (0L, 14L, 3L))
      .toDF("q_id", "doc_id", "rank")
    val fused = RetrievalOps.rrfFuse(Seq(r1, r2), topK = 5).collect()
    val byDoc = fused.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("rn"), r.getAs[Long]("rrf_ppm"),
        r.getAs[Long]("n_rankers"))).toMap
    // doc 10 (rank 1 + rank 2) beats doc 13 (rank 1 in one ranker only)
    assert(byDoc(10L)._1 == 1L && byDoc(10L)._3 == 2L)
    assert(byDoc(13L)._1 == 2L && byDoc(13L)._3 == 1L)
    // exact integer contributions: 10^6 div 61 + 10^6 div 62
    assert(byDoc(10L)._2 == 1000000L / 61 + 1000000L / 62)
  }

  test("hybridRrfTopK: a verbatim near-duplicate of the probe is the " +
    "fused rank-1 with both rankers agreeing") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = docs(
      0L -> base, // probe (doc_id % 50 == 0)
      1L -> base, // verbatim copy
      2L -> "alpha beta unrelated words entirely different here now",
      3L -> "completely disjoint vocabulary nothing shared at all",
      4L -> "gamma delta epsilon zeta some overlap in the middle")
    val out = RetrievalOps.hybridRrfTopK(corpus, probeMod = 50,
      kPerRanker = 3, topK = 3).collect()
    val top = out.filter(r => r.getAs[Long]("q_id") == 0L &&
      r.getAs[Long]("rn") == 1L).head
    assert(top.getAs[Long]("doc_id") == 1L)
    assert(top.getAs[Long]("n_rankers") == 2L)
  }

  test("bm25 stored index: a fresh worker serves byte-identical results " +
    "from the artifacts alone, with the query terms pushed to the " +
    "postings scan") {
    val sf = "/root/testdata/sf0.001"
    val idx = java.nio.file.Files.createTempDirectory("bm25_idx").toString
    val queries = Seq("qa" -> Seq("dup", "merge"), "qb" -> Seq("spark"))
    val docs = Tables.documents(spark, sf)
    val fresh = RetrievalOps.bm25TopK(docs, queries, k = 5)
      .collect().map(_.toString).toSeq
    assert(RetrievalOps.bm25WriteIndex(docs, s"$sf/documents.parquet", idx))
    // worker session: no memo state, artifacts only
    val worker = spark.newSession()
    val served = RetrievalOps.bm25TopKFromIndex(worker, idx, queries, k = 5)
    val servedRows = served.collect().map(_.toString).toSeq
    assert(servedRows.nonEmpty && servedRows == fresh,
      "stored search must equal the in-plan search")
    // the terms reach the postings scan as a pushed In filter and the
    // scan decodes fewer rows than the full postings relation
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val postingScans = allScans(served.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(
        _.toString.contains("postings")))
    assert(postingScans.nonEmpty, "no postings FileSourceScan in the plan")
    assert(postingScans.exists(_.metadata.getOrElse("PushedFilters", "")
      .contains("In(word")),
      "query terms must reach the postings scan as a pushed filter")
    val scanned = postingScans.map(_.metrics("numOutputRows").value).sum
    val total = worker.read.parquet(s"$idx/postings").count()
    assert(scanned > 0 && scanned < total,
      s"term-filtered scan must decode fewer rows ($scanned) than the " +
        s"postings relation ($total)")
  }

  test("bm25WriteIndex memoizes on the corpus fingerprint: a same-" +
    "corpus rebuild leaves the artifact mtime untouched") {
    val sf = "/root/testdata/sf0.001"
    val idx = java.nio.file.Files.createTempDirectory("bm25_memo").toString
    val docs = Tables.documents(spark, sf)
    assert(RetrievalOps.bm25WriteIndex(docs, s"$sf/documents.parquet", idx))
    val stamp = new java.io.File(s"$idx/postings").lastModified()
    Thread.sleep(1100)
    assert(RetrievalOps.bm25WriteIndex(docs, s"$sf/documents.parquet", idx))
    assert(new java.io.File(s"$idx/postings").lastModified() == stamp,
      "unchanged corpus must be a memo hit, not a rewrite")
  }
}

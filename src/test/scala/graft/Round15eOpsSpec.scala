package graft

import graft.operators.{DedupOps, Relational, SimilarityOps}
import org.apache.spark.sql.functions._

/** Round-15 wave-5 engine pins on constructed inputs where the right
  * answer is known a priori (the declared keys hash-check the
  * real-fixture relations against DuckDB).
  */
class Round15eOpsSpec extends SparkSpec {

  test("intervalOverlapPairs: grid join equals the naive inequality " +
    "join — touching, nested, cell-straddling, and cell-sharing-but-" +
    "disjoint cases included") {
    import spark.implicits._
    // cell = 10: intervals deliberately straddle cells, share cells
    // without overlapping, touch exactly, and nest
    val iv = Seq(
      (1L, 0L, 4L),    // cell 0
      (2L, 4L, 12L),   // touches 1 at 4, straddles cells 0-1
      (3L, 13L, 13L),  // point; same cell as 2's tail but disjoint
      (4L, 5L, 30L),   // long: overlaps 2, 3, 5; spans cells 0-3
      (5L, 25L, 27L),  // nested inside 4
      (6L, 40L, 45L)   // isolated
    ).toDF("iv_id", "s_start", "s_end")
    val got = Relational.intervalOverlapPairs(iv, cellUs = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rows = iv.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      (ai, as_, ae) <- rows; (bi, bs, be) <- rows
      if ai < bi && as_ <= be && bs <= ae
    } yield (ai, bi) -> (math.min(ae, be) - math.max(as_, bs))).toMap
    assert(got == want, s"grid=$got naive=$want")
    // the constructed cases actually exercised what they claim
    assert(want.contains((1L, 2L)) && want((1L, 2L)) == 0L, "touching")
    assert(want.contains((4L, 5L)), "nested")
    assert(!want.contains((2L, 3L)), "cell-sharing but disjoint")
  }

  test("intervalOverlapPairs: each overlapping pair emitted exactly " +
    "once even when both intervals span many shared cells") {
    import spark.implicits._
    val iv = Seq((1L, 0L, 95L), (2L, 3L, 88L)).toDF("iv_id", "s_start", "s_end")
    val out = Relational.intervalOverlapPairs(iv, cellUs = 10L).collect()
    assert(out.length == 1, s"expected one row, got ${out.toSeq}")
    assert(out.head.getLong(2) == 85L)
  }

  test("decontaminateStored serves the written shingle artifact and " +
    "matches the in-plan decontaminate row-for-row") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val bench = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val outDir = new java.io.File(
      "target/test_decon_index").getAbsolutePath
    val fresh = DedupOps.decontaminate(corpus, bench, n = 3, minShared = 2)
      .collect().map(_.toSeq).toSeq
    val stored = DedupOps.decontaminateViaIndex(corpus, bench,
      srcDir = "/root/testdata/sf0.001/documents.parquet",
      outDir = outDir, n = 3, minShared = 2, benchKey = "testmod10")
      .collect().map(_.toSeq).toSeq
    assert(stored == fresh)
    assert(fresh.nonEmpty, "fixture produced no contaminated pairs — " +
      "the parity check would be vacuous")
    // the artifact genuinely landed on disk
    assert(new java.io.File(s"$outDir/shingles").exists())
    // a fresh-worker read of the artifact alone serves the same rows
    val worker = DedupOps.decontaminateStored(corpus, outDir,
      n = 3, minShared = 2).collect().map(_.toSeq).toSeq
    assert(worker == fresh)
  }

  test("hardNegativesTopK: never returns the probe's own label or " +
    "itself, ranks are dense, and each row's score matches the exact " +
    "unrestricted scan's score for that (probe, neighbor)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = Seq(0L, 1L, 2L)
    val hard = SimilarityOps.hardNegativesTopK(emb, probes, k = 4).collect()
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hard.nonEmpty)
    hard.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).toSeq.sorted == (1L to rows.length),
        s"ranks not dense for probe $q")
      rows.foreach { r =>
        assert(r.getLong(2) != q, "probe returned itself")
        assert(r.getLong(3) != labels(q).toLong,
          s"probe $q got its own label back")
        assert(r.getLong(3) == labels(r.getLong(2)).toLong,
          "n_label must be the neighbor's stored label")
      }
    }
    // scores agree with the unrestricted exact scan (same arithmetic)
    val exact = SimilarityOps.topKDotExact(emb, probes, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    hard.foreach { r =>
      assert(exact((r.getLong(0), r.getLong(2))) == r.getLong(4),
        "hard-negative score diverged from the exact scan")
    }
  }

  test("domainReweight: uniform start, ppm mass conserved up to " +
    "truncation, and the max-loss domain's share never decreases " +
    "under the positive-excess update") {
    import graft.operators.TextOps
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val iters = 4
    val out = TextOps.domainReweight(docs, iters = iters).collect()
    val byIter = out.groupBy(_.getLong(0))
    assert(byIter.keySet == (0L to iters).toSet)
    val d = byIter(0L).length
    assert(byIter.values.forall(_.length == d), "domain set must be stable")
    // iteration 0 is uniform
    assert(byIter(0L).map(_.getLong(3)).distinct.toSeq == Seq(1000000L / d))
    // renormalized mass: each iteration sums to 1e6 within div slack
    byIter.foreach { case (t, rows) =>
      val s = rows.map(_.getLong(3)).sum
      assert(s <= 1000000L && s > 1000000L - d,
        s"iter $t ppm mass $s out of range")
    }
    // the max-loss domain's excess is never negative, so its factor is
    // maximal every round: its share must be non-decreasing
    val maxLossSrc = byIter(0L).maxBy(r => (r.getLong(2), r.getString(1)))
      .getString(1)
    val shares = (0L to iters).map(t =>
      byIter(t).find(_.getString(1) == maxLossSrc).get.getLong(3))
    assert(shares == shares.sorted,
      s"max-loss domain share not monotone: $shares")
    // and it actually moved — the step is visible, not vacuous
    assert(shares.last > shares.head, s"weights never moved: $shares")
  }

  test("lDiversityAudit: the homogeneity attack is flagged — a large " +
    "group with one sensitive value fails l-diversity while passing " +
    "k-anonymity, NULL sensitive values count toward n but not l") {
    import spark.implicits._
    val rows = (
      (1 to 12).map(i => ("a", s"s${i % 4}")) ++   // n=12, l=4: both pass
      (1 to 10).map(_ => ("b", "s0")) ++           // n=10, l=1: homogeneous
      Seq(("c", "s0"), ("c", "s1"), ("c", null))   // n=3,  l=2: small
    ).toDF("qi", "sens")
    val got = graft.operators.Relational
      .lDiversityAudit(rows, Seq("qi"), "sens", k = 5L, l = 3L)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == (12L, 4L, 1L, 1L))
    assert(got("b") == (10L, 1L, 1L, 0L), "homogeneous group must fail l")
    assert(got("c") == (3L, 2L, 0L, 0L), "NULL sensitive must not raise l")
  }

  test("dimensionAudit: exact integer mean/variance on constructed " +
    "vectors, the constant dimension ranks first") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(0.5f, 1.0f, 2.0f)),
      (2L, Array(0.5f, 3.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.dimensionAudit(emb).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // dim 0: constant 0.5 → mean 5000 s4, var 0, rank 1 (collapsed)
    assert(got(0L) == (2L, 5000L, 0L, 1L))
    // dim 1: {1, 3} → mean 2.0, population var 1.0 = 1e8 s8
    assert(got(1L) == (2L, 20000L, 100000000L, 3L))
    // dim 2: constant 2.0 → var 0, rank 2 (pos tiebreak after dim 0)
    assert(got(2L) == (2L, 20000L, 0L, 2L))
  }

  test("decontamination is micro-batch-local: per-batch probes of the " +
    "stored index union to the full-corpus relation — the ingest loop " +
    "needs no cross-batch decon state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val outDir = new java.io.File(
      "target/test_decon_index_stream").getAbsolutePath
    DedupOps.deconWriteIndex(bench,
      "/root/testdata/sf0.001/documents.parquet", outDir,
      n = 3, benchKey = "streammod10")
    val want = DedupOps.decontaminateStored(corpus, outDir, n = 3,
      minShared = 2).collect().map(_.toSeq).toSet
    assert(want.nonEmpty, "fixture must contaminate or the pin is vacuous")
    val rows = corpus.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = rows.partition(_._1 % 2 == 0)
    assert(b1.nonEmpty && b2.nonEmpty)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[Seq[Any]]
    val probe: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      Long) => Unit = (batch, _) =>
      got ++= DedupOps.decontaminateStored(
        batch.toDF("doc_id", "text"), outDir, n = 3, minShared = 2)
        .collect().map(_.toSeq)
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(probe).start()
    try {
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toSeq: _*)
      q.processAllAvailable()
      assert(got.toSet == want,
        "per-micro-batch decon diverged from the full-corpus relation")
    } finally q.stop()
  }

  test("intervalCoverage: touching intervals merge, gaps split islands, " +
    "covered length is the island-union measure") {
    import spark.implicits._
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L),   // overlap -> one island [0,20]
      (1L, 20L, 25L),                 // touches -> still island [0,25]
      (1L, 30L, 31L),                 // gap -> second island
      (2L, 0L, 5L),                   // contained chain: [0,5] covers
      (2L, 1L, 2L), (2L, 3L, 9L),     // [1,2]; [3,9] extends to 9
      (3L, 7L, 7L)                    // degenerate point interval
    ).toDF("user_id", "s_start", "s_end")
    val got = graft.operators.Relational.intervalCoverage(iv, "user_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == (4L, 2L, 26L), s"user 1: ${got(1L)}") // 25 + 1
    assert(got(2L) == (3L, 1L, 9L), s"user 2: ${got(2L)}")
    assert(got(3L) == (1L, 1L, 0L), s"user 3: ${got(3L)}")
  }

  test("mutualKnnClustersStored serves the written edge artifact and " +
    "matches the in-plan clustering row-for-row") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = Seq(0L, 1L, 2L, 3L)
    val fresh = SimilarityOps.mutualKnnClusters(emb, probes, k = 3)
      .collect().map(_.toSeq).toSeq
    val outDir = new java.io.File("target/test_knn_graph").getAbsolutePath
    val stored = SimilarityOps.mutualKnnClustersStored(emb,
      srcDir = "/root/testdata/sf0.001/embeddings.parquet",
      outDir = outDir, probeIds = probes, k = 3)
      .collect().map(_.toSeq).toSeq
    assert(stored == fresh)
    assert(new java.io.File(s"$outDir/edges").exists())
    // non-vacuous: some cluster must be non-singleton
    val clusters = fresh.map(_(1)).groupBy(identity).map(_._2.size)
    assert(clusters.exists(_ > 1),
      "fixture produced only singletons — parity would be vacuous")
  }

  test("bfsDepths: first-visit depths on a known graph — path, branch, " +
    "cycle, depth bound, and disconnected vertices excluded") {
    import spark.implicits._
    // 1-2-3-4-5-6 path, 2-10 branch, 3-4-11-3 cycle, 20-21 disconnected
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (2L, 10L), (4L, 11L), (11L, 3L), (20L, 21L))
      .toDF("a_id", "b_id")
    val got = DedupOps.bfsDepths(edges, seeds = Seq(1L), maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 10L -> 2L, 3L -> 2L,
      4L -> 3L, 11L -> 3L), s"got $got")
    // raising the bound reaches deeper; the cycle never re-relaxes 3
    val deeper = DedupOps.bfsDepths(edges, Seq(1L), maxDepth = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deeper(5L) == 4L && deeper(6L) == 5L && deeper(3L) == 2L)
    assert(!deeper.contains(20L), "disconnected vertex must be absent")
    // multi-seed: min over seeds wins
    val two = DedupOps.bfsDepths(edges, Seq(1L, 5L), maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two(4L) == 1L && two(6L) == 1L && two(3L) == 2L)
  }

  test("mutualClusterPurity: rows agree with a driver-side recount of " +
    "the clustering + labels, singletons excluded") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = Seq(0L, 1L, 2L, 3L)
    val purity = SimilarityOps.mutualClusterPurity(emb, probes, k = 3,
      minSize = 2L).collect()
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val clusters = SimilarityOps.mutualKnnClusters(emb, probes, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val want = clusters.collect { case (cid, members) if members.length >= 2 =>
      val votes = members.map(labels).groupBy(identity).view
        .mapValues(_.size.toLong).toSeq
      val (majLabel, majVotes) = votes.minBy { case (l, v) => (-v, l) }
      cid -> (members.length.toLong, majLabel, majVotes,
        majVotes * 1000000L / members.length)
    }
    val got = purity.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want, s"purity diverged:\n got=$got\nwant=$want")
    assert(want.nonEmpty, "no non-singleton clusters — vacuous fixture")
  }

  test("mixtureSchedule: every domain scheduled once, allocation mass " +
    "equals the budget up to ppm truncation, per-row arithmetic exact") {
    import graft.operators.TextOps
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val budget = 50000L
    val out = TextOps.mixtureSchedule(docs, budgetTokens = budget,
      iters = 3).collect()
    val nDomains = docs.select("source").distinct().count()
    assert(out.length == nDomains, "one schedule row per domain")
    out.foreach { r =>
      val (w, avail, alloc, ep) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(alloc == w * budget / 1000000L)
      assert(ep == alloc * 256L / avail)
      assert(avail > 0)
    }
    val total = out.map(_.getLong(4)).sum
    assert(total <= budget && total > budget - nDomains * (budget / 1000000L + 1),
      s"allocated $total of $budget")
  }

  test("zipfAudit: doubling rank buckets with exact counts on a " +
    "constructed frequency profile") {
    import spark.implicits._
    import graft.operators.TextOps
    // frequencies: a=8, b=4, c=2, d=1, e=1 → ranks 1..5, buckets 0,1,1,2,2
    val docs = Seq("a a a a a a a a b b b b c c d e")
      .toDF("text")
    val got = TextOps.zipfAudit(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got(0L) == (1L, 8L, 8L, 8L, 3L * 256L), s"bucket 0: ${got(0L)}")
    assert(got(1L) == (2L, 6L, 2L, 4L, (2L + 1L) * 256L / 2L),
      s"bucket 1: ${got(1L)}")
    assert(got(2L) == (2L, 2L, 1L, 1L, 0L), s"bucket 2: ${got(2L)}")
  }
}

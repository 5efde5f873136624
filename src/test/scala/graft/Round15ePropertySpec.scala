package graft

import graft.operators.{DedupOps, Relational, SimilarityOps}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property pins for the round-15 wave-5/7 graph + interval engines:
  * randomized inputs against independent driver-side references, so the
  * grid attribution and frontier logic hold beyond the hand-built
  * fixtures of Round15eOpsSpec.
  */
class Round15ePropertySpec extends SparkSpec {
  import spark.implicits._

  // Spark-job-per-case is expensive — fewer, larger random cases
  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  test("intervalOverlapPairs equals the naive O(n²) reference on random " +
    "interval sets across random cell widths") {
    val genIv = Gen.listOfN(40,
      for {
        s <- Gen.choose(0L, 300L)
        len <- Gen.choose(0L, 60L)
      } yield (s, s + len))
    val genCell = Gen.oneOf(1L, 7L, 10L, 64L, 1000L)
    check(Prop.forAll(genIv, genCell) { (ivs, cell) =>
      val rows = ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      val got = Relational
        .intervalOverlapPairs(rows.toDF("iv_id", "s_start", "s_end"), cell)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = (for {
        (ai, as_, ae) <- rows; (bi, bs, be) <- rows
        if ai < bi && as_ <= be && bs <= ae
      } yield (ai, bi) -> (math.min(ae, be) - math.max(as_, bs))).toMap
      got == want
    })
  }

  test("intervalCoverage conserves mass: covered_us equals the measure " +
    "of the union of a random interval set, islands partition it") {
    val genIv = Gen.listOfN(30,
      for {
        k <- Gen.choose(1L, 3L)
        s <- Gen.choose(0L, 200L)
        len <- Gen.choose(0L, 40L)
      } yield (k, s, s + len))
    check(Prop.forAll(genIv) { ivs =>
      val out = Relational
        .intervalCoverage(ivs.toDF("user_id", "s_start", "s_end"), "user_id")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
      ivs.groupBy(_._1).forall { case (k, rows) =>
        // reference union measure over the integer point grid
        // ([s, e) half-open after the engine's e - s island lengths;
        // degenerate s == e intervals contribute 0 but still merge)
        val points = rows.flatMap { case (_, s, e) => s until e }.toSet
        val (nIv, covered) = out(k)
        nIv == rows.length && covered == points.size
      }
    })
  }

  test("bfsDepths is consistent with connectedComponents: reached = " +
    "exactly the seeds' components (at a generous bound), depths bound " +
    "by the vertex count") {
    val genEdges = Gen.listOfN(25,
      for {
        a <- Gen.choose(0L, 15L)
        b <- Gen.choose(0L, 15L)
        if a != b
      } yield (a, b))
    check(Prop.forAll(genEdges, Gen.choose(0L, 15L)) { (edges, seed) =>
      {
        // listOfN with a filtered element Gen retries per element, so
        // the edge list is always the full 25 rows — no empty guard
        val df = edges.toDF("a_id", "b_id")
        val depths = DedupOps.bfsDepths(df, Seq(seed), maxDepth = 20)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val cc = DedupOps.connectedComponents(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // vertices in the seed's component (seed itself may be isolated)
        val component = cc.get(seed) match {
          case Some(cid) => cc.collect { case (v, c) if c == cid => v }.toSet
          case None      => Set.empty[Long]
        }
        val expected = component + seed
        depths.keySet == expected &&
        depths(seed) == 0L &&
        depths.values.forall(d => d >= 0L && d < 16L)
      }
    })
  }

  test("hardNegativesTopK is exactly topKDotExact run on the wrong-label " +
    "slice, for random probe choices over the fixture corpus") {
    // cache for the repeated forAll cases, but UNPERSIST before leaving:
    // the test JVM shares one session, and a lingering cached embeddings
    // relation turns other suites' parquet scans into InMemoryTableScans
    // (PushdownSpec's ReadSchema pins would read an empty plan line)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
    try {
      val labels = emb.select("vec_id", "label").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val ids = labels.keys.toSeq.sorted
      val genProbe = Gen.oneOf(ids)
      check(Prop.forAll(genProbe) { probe =>
        val hard = SimilarityOps.hardNegativesTopK(emb, Seq(probe), k = 3)
          .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
        import org.apache.spark.sql.functions.col
        val slice = emb.filter(col("label") =!= labels(probe))
          .unionByName(emb.filter(col("vec_id") === probe))
        val ref = SimilarityOps.topKDotExact(slice, Seq(probe), k = 4)
          .collect()
          .filter(_.getLong(2) != probe).take(3)
          .zipWithIndex.map { case (r, i) =>
            (i + 1L, r.getLong(2), r.getLong(3))
          }
        hard.toSeq == ref.toSeq
      })
    } finally emb.unpersist()
  }
}

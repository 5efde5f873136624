package graft

import graft.operators.DedupOps
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the round-6 operators: the optimized distributed
  * formulations must agree with their trivially-correct counterparts on
  * every random input — prefix-filtered containment vs the full
  * inverted-index join, and degree-oriented triangle closure vs
  * driver-side brute-force enumeration.
  */
class Round6PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(12)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  test("containmentPairsPrefix equals containmentPairs on random corpora") {
    // small vocab (8 symbols) forces heavy word sharing — the regime
    // where prefix filtering has real pruning work to do and where a
    // recall bug (too-short prefix) would drop pairs
    val docGen = for {
      nDocs <- Gen.choose(2, 8)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 10)
        ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
      } yield ws.mkString(" "))
      pct <- Gen.oneOf(50, 80, 90, 100)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, pct)
    check(Prop.forAll(docGen) { case (docs, pct) =>
      val df = docs.toDF("doc_id", "text")
      val full = DedupOps.containmentPairs(df, pct)
        .collect().map(_.toSeq).toSeq
      val pref = DedupOps.containmentPairsPrefix(df, pct)
        .collect().map(_.toSeq).toSeq
      pref == full
    })
  }

  test("tfidfCosinePairsPrefix equals tfidfCosinePairs on random corpora") {
    // tiny vocab → heavy sharing; a prefix-bound bug (rounding that
    // shortens a prefix) would drop qualifying pairs here
    val docGen = for {
      nDocs <- Gen.choose(2, 7)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 8)
        ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "f"))
      } yield ws.mkString(" "))
      pct <- Gen.oneOf(50, 80, 95, 100)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, pct)
    check(Prop.forAll(docGen) { case (docs, pct) =>
      val df = docs.toDF("doc_id", "text")
      val full = DedupOps.tfidfCosinePairs(df, pct)
        .collect().map(_.toSeq).toSeq
      val pref = DedupOps.tfidfCosinePairsPrefix(df, pct)
        .collect().map(_.toSeq).toSeq
      pref == full
    })
  }

  /** Brute-force per-node triangle counts over an edge list. */
  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.filter(e => e._1 != e._2).toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.distinct
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    for {
      Seq(u, v, w) <- nodes.sorted.combinations(3)
      if es((u, v)) && es((u, w)) && es((v, w))
      x <- Seq(u, v, w)
    } counts(x) = counts.getOrElse(x, 0L) + 1L
    counts.toMap
  }

  test("triangleCounts equals brute-force enumeration on random graphs") {
    val edgeGen = for {
      n <- Gen.choose(1, 20)
      edges <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 9L)
        b <- Gen.choose(0L, 9L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct
    check(Prop.forAll(edgeGen) { edges =>
      edges.isEmpty || {
        val got = DedupOps.triangleCounts(edges.toDF("a_id", "b_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        got == bruteTriangles(edges)
      }
    })
  }
}

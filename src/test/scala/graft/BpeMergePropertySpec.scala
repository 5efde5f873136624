package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property pin for [[graft.plans.BpeMergePair]]: on random symbol
  * arrays over a tiny alphabet (so same-symbol runs, grown symbols, and
  * collision-shaped originals like "aa" all occur often), the fused
  * fold must equal an INDEPENDENT driver-side implementation of the
  * leftmost-nonoverlapping scan — written as an explicit
  * position-walking loop, not a fold, so the two can only agree if the
  * fold ≡ scan equivalence argued in the expression's scaladoc actually
  * holds on every input.
  */
class BpeMergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(40)

  /** The trivially-correct reference: scan positions left to right,
    * merging at i whenever (s(i), s(i+1)) == (l, r) and jumping past
    * both — the textbook definition, no fold.
    */
  private def scanMerge(s: Seq[String], l: String, r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  test("BpeMergePair equals the position-walking scan on random inputs") {
    val symGen = Gen.oneOf("a", "b", "aa", "ab", "ba")
    val caseGen = for {
      n <- Gen.choose(0, 10)
      syms <- Gen.listOfN(n, symGen)
      l <- symGen
      r <- symGen
    } yield (syms, l, r)
    val prop = Prop.forAll(Gen.listOfN(12, caseGen)) { cases =>
      val viaExpr = cases.zipWithIndex
        .map { case ((syms, l, r), i) => (i.toLong, syms, l, r) }
        .toDF("id", "syms", "l", "r")
        .select(col("id"), graft.plans.BpeMergePair.bpeMergePair(
          col("syms"), col("l"), col("r")).as("m"))
        .as[(Long, Seq[String])].collect().sortBy(_._1).map(_._2).toSeq
      val viaScan = cases.map { case (syms, l, r) => scanMerge(syms, l, r) }
      viaExpr == viaScan
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}

package graft

import graft.functions.Cleaning
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based tests (SURVEY §5.2.3) using raw ScalaCheck: generated
  * money/runtime strings round-trip through the parsers; pivot row sums
  * preserve group counts. Each property batches its samples into one
  * DataFrame pass so Spark overhead stays sane.
  */
class CleaningPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(20)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  private def parseOne(s: String): Option[Double] = {
    val r = Seq(s).toDF("s").select(Cleaning.parseDollars(col("s"))).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  private def runtimeOne(s: String): Int =
    Seq(s).toDF("s").select(Cleaning.parseRunningTime(col("s"))).collect()(0).getInt(0)

  test("parseDollars inverts 'X million' formatting") {
    check(Prop.forAll(Gen.choose(1, 9999), Gen.choose(0, 9)) { (whole, frac) =>
      val v = whole + frac / 10.0
      parseOne(f"$$$v%.1f million").exists(g => math.abs(g - v * 1e6) < 1e-3)
    })
  }

  test("parseDollars inverts 'X billion' formatting") {
    check(Prop.forAll(Gen.choose(1, 99), Gen.choose(0, 9)) { (whole, frac) =>
      val v = whole + frac / 10.0
      parseOne(f"$$$v%.1f billion").exists(g => math.abs(g - v * 1e9) < 1e-1)
    })
  }

  test("parseDollars inverts comma-grouped formatting") {
    check(Prop.forAll(Gen.choose(1000000, 999999999)) { v =>
      parseOne(f"$$$v%,d").contains(v.toDouble)
    })
  }

  test("parseRunningTime inverts h/min formatting") {
    check(Prop.forAll(Gen.choose(1, 5), Gen.choose(0, 59)) { (h, m) =>
      runtimeOne(s"$h h $m min") == h * 60 + m &&
        runtimeOne(s"${h * 60 + m} minutes") == h * 60 + m
    })
  }

  test("pivot row sums equal plain group counts (algebraic property)") {
    check(Prop.forAll(
      Gen.listOfN(40, Gen.zip(Gen.choose(1, 5), Gen.oneOf("a", "b", "c")))) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("k", "t")
        val pivoted = operators.Relational.pivotCounts(df, "k", "t", Seq("a", "b", "c"))
        val sums = pivoted.select(col("k"), (col("a") + col("b") + col("c")).as("total"))
        val direct = df.groupBy("k").count()
        sums.join(direct, "k").filter(col("total") =!= col("count")).count() == 0
      }
    })
  }
}

package graft

import graft.operators.{DedupOps, Relational}
import graft.plans.VecDot
import org.apache.spark.sql.functions._

/** Round-7 hardening tests: the three ADVICE-r6 behavior changes each
  * get the failing input they guard against — a mid-array null struct
  * in the sorted_kw_dot merge walk, a duplicate/both-orientation edge
  * list into triangleCounts, and a null category into
  * distributionDrift.
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- SortedKeyWeightDot mid-array nulls ----------------

  test("sorted_kw_dot skips null structs anywhere in the array (codegen path)") {
    // before the per-iteration guards, a mid-array null struct NPE'd
    // interpreted eval and read garbage in codegen — only LEADING nulls
    // were skipped
    val r = spark.sql(
      """SELECT a, b FROM VALUES (
        |  array(named_struct('k', 1L, 'w', 10L),
        |        CAST(NULL AS STRUCT<k: BIGINT, w: BIGINT>),
        |        named_struct('k', 3L, 'w', 5L)),
        |  array(CAST(NULL AS STRUCT<k: BIGINT, w: BIGINT>),
        |        named_struct('k', 3L, 'w', 4L),
        |        CAST(NULL AS STRUCT<k: BIGINT, w: BIGINT>),
        |        named_struct('k', 9L, 'w', 7L))
        |) AS t(a, b)""".stripMargin)
      .select(VecDot.sortedKeyWeightDot(col("a"), col("b")).as("dot"))
      .collect()(0)
    assert(r.getLong(0) == 5L * 4L, s"got ${r.getLong(0)}")
  }

  test("sorted_kw_dot skips null structs in interpreted eval too") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("w", org.apache.spark.sql.types.LongType)))
    val at = org.apache.spark.sql.types.ArrayType(st, containsNull = true)
    def row(k: Long, w: Long): InternalRow = InternalRow(k, w)
    val a = new GenericArrayData(Array[Any](row(1L, 10L), null, row(3L, 5L)))
    val b = new GenericArrayData(Array[Any](null, row(3L, 4L), null, row(9L, 7L)))
    val expr = graft.plans.SortedKeyWeightDot(Literal(a, at), Literal(b, at))
    assert(expr.eval(InternalRow.empty) == 20L)
  }

  // ---------------- triangleCounts input normalization ----------------

  test("triangleCounts normalizes duplicate edges, reversed orientations, self-loops") {
    // K3 on {1,2,3} delivered as: both orientations of (1,2), a
    // duplicated (1,3), a self-loop — exactly the non-compliant input
    // that used to double degrees and replicate wedges
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L), (3L, 2L), (2L, 2L))
      .toDF("a_id", "b_id")
    val clean = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a_id", "b_id")
    val got = DedupOps.triangleCounts(messy)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ref = DedupOps.triangleCounts(clean)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == ref)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // ---------------- distributionDrift null-category guard ----------------

  test("distributionDrift fails loudly on a null category") {
    val a = Seq(Some("en"), Some("fr"), None).toDF("cat")
    val b = Seq(Some("en"), Some("fr")).toDF("cat")
    val ex = intercept[Exception] {
      Relational.distributionDrift(a, b, "cat").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("distributionDrift")),
      s"wrong error: $ex")
  }

  test("distributionDrift output unchanged for null-free categories") {
    val a = Seq("en", "en", "fr").toDF("cat")
    val b = Seq("en", "fr", "fr", "fr").toDF("cat")
    val got = Relational.distributionDrift(a, b, "cat")
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4))).toSeq
    // shares: a = en 2/3, fr 1/3; b = en 1/4, fr 3/4 (ppm, div truncation)
    assert(got == Seq(("en", 666666L, 250000L), ("fr", 333333L, 750000L)))
  }
}

package graft

import graft.plans.VecDot
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot_long equals the zip_with/aggregate fold it replaces") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-7L, 0L, 9L), Seq(2L, 100L, -3L)),
      (Seq.empty[Long], Seq.empty[Long]))
      .toDF("a", "b")
    val out = df.select(
      VecDot.dotLong(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("ref")).collect()
    out.foreach { r =>
      val ref = if (r.isNullAt(1)) 0L else r.getLong(1) // empty-array fold
      assert(r.getLong(0) == ref, s"fast=${r.getLong(0)} ref=$ref")
    }
    assert(out(0).getLong(0) == 4 + 10 + 18)
  }

  test("vec_dot_float computes the same left-to-right double sum") {
    val df = Seq((Seq(0.5f, -1.25f, 2.0f), Seq(4.0f, 2.0f, 0.5f)))
      .toDF("a", "b")
    val got = df.select(VecDot.dotFloat(col("a"), col("b"))).collect()(0).getDouble(0)
    val exp = 0.5 * 4.0 + (-1.25) * 2.0 + 2.0 * 0.5
    assert(got == exp, s"$got vs $exp")
  }

  test("null array yields null; null elements contribute zero") {
    VecDot.register(spark)
    val r = spark.sql(
      """SELECT vec_dot_long(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS n,
        |  vec_dot_long(array(1L, NULL, 3L), array(10L, 20L, 30L)) AS z
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0))
    assert(r.getLong(1) == 10L + 90L)
  }

  test("usable from SQL after registration (driver-session parity)") {
    VecDot.register(spark)
    val r = spark.sql(
      "SELECT vec_dot_float(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted distinct arrays") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),  // common {3, 9}
      (Seq(1L, 2L), Seq(3L, 4L)),                    // disjoint
      (Seq.empty[Long], Seq(1L)),                    // empty side
      (Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L)))          // identical
      .toDF("a", "b")
    val out = df.select(
      VecDot.sortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"fast=${r.getLong(0)} ref=${r.getLong(1)}"))
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 0L, 0L, 3L))
  }

  test("sorted_kw_dot equals the map-based weighted dot on sorted key-weight arrays") {
    def kw(pairs: (Long, Long)*): Seq[(Long, Long)] = pairs.sortBy(_._1)
    val df = Seq(
      (kw(1L -> 10L, 3L -> 5L, 9L -> 2L), kw(3L -> 4L, 9L -> 7L, 12L -> 1L)),
      (kw(1L -> 3L), kw(2L -> 4L)),                 // disjoint → 0
      (Seq.empty[(Long, Long)], kw(1L -> 5L)),      // empty side → 0
      (kw(2L -> -3L, 5L -> 6L), kw(2L -> 7L, 5L -> 6L)))  // negative weights
      .toDF("a", "b")
      .select(
        col("a").cast("array<struct<k:bigint,w:bigint>>").as("a"),
        col("b").cast("array<struct<k:bigint,w:bigint>>").as("b"))
    val got = df.select(VecDot.sortedKeyWeightDot(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    // row 1: 5·4 + 2·7 = 34; row 4: −3·7 + 6·6 = 15
    assert(got == Seq(34L, 0L, 0L, 15L))
  }

  test("interpreted eval agrees with codegen on the corpus embeddings") {
    // force the interpreted path by evaluating the expression directly
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(4).select("embedding").collect()
      .map(_.getSeq[Float](0))
    val df = Seq((emb(0), emb(1)), (emb(2), emb(3))).toDF("a", "b")
    val viaPlan = df.select(VecDot.dotFloat(col("a"), col("b"))).collect()
      .map(_.getDouble(0)).toSeq
    val viaDriver = Seq((emb(0), emb(1)), (emb(2), emb(3))).map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    }
    assert(viaPlan == viaDriver)
  }
}

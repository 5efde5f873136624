package graft

import graft.operators.{DedupOps, TextOps}

/** Round-15 wave-4 entity-resolution + curriculum pins on constructed
  * inputs where the right answer is known a priori (the declared keys
  * hash-check the real-fixture relations against DuckDB).
  */
class Round15dOpsSpec extends SparkSpec {

  test("blockedFuzzyPairs: near names pair only WITHIN a block, tau " +
    "bounds the distance, support counts roll up row multiplicity") {
    import spark.implicits._
    val rows = Seq(
      "john smith", "john smith", "jon smith", // lev 1, same block
      "john smyth",                            // different block (smyth)
      "mary smith"                             // lev 4 from john smith
    ).toDF("name")
    val pairs = DedupOps.blockedFuzzyPairs(rows, "name", tau = 2).collect()
    val keys = pairs.map(r => (r.getAs[String]("name_a"),
      r.getAs[String]("name_b"))).toSet
    assert(keys == Set(("john smith", "jon smith")),
      s"expected exactly the within-block lev<=2 pair, got $keys")
    val p = pairs.head
    assert(p.getAs[Long]("lev") == 1L)
    assert(p.getAs[Long]("rows_a") == 2L && p.getAs[Long]("rows_b") == 1L)
  }

  test("fuzzyEntityResolve: clusters resolve to the lexicographic " +
    "minimum, members sort, singletons survive") {
    import spark.implicits._
    val rows = Seq(
      "john smith", "jon smith", "jhon smith", // one entity (chained)
      "mary jones",                            // singleton
      "marie jones"                            // pairs with mary (lev 2)
    ).toDF("name")
    val out = DedupOps.fuzzyEntityResolve(rows, "name", tau = 2)
      .collect().map(r => r.getAs[String]("canonical") ->
        (r.getAs[Long]("n_names"), r.getAs[String]("members"))).toMap
    assert(out.keySet == Set("jhon smith", "marie jones"),
      s"got ${out.keySet}")
    assert(out("jhon smith") == (3L, "jhon smith,john smith,jon smith"))
    assert(out("marie jones") == (2L, "marie jones,mary jones"))
  }

  test("curriculumShards: positions dense per shard, band non-" +
    "decreasing along each shard's stream, every doc assigned once") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val n = docs.count()
    val out = TextOps.curriculumShards(docs, nShards = 8, nBands = 10)
      .collect()
    assert(out.length == n)
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == n)
    out.groupBy(_.getAs[Long]("shard")).foreach { case (sh, rows) =>
      val byPos = rows.sortBy(_.getAs[Long]("pos"))
      assert(byPos.map(_.getAs[Long]("pos")).toSeq ==
        (1L to rows.length).toSeq, s"pos not dense in shard $sh")
      val bands = byPos.map(_.getAs[Long]("band")).toSeq
      assert(bands == bands.sorted, s"curriculum order broken in $sh")
    }
    // bands actually spread (the fixture has length variance)
    assert(out.map(_.getAs[Long]("band")).distinct.length >= 3)
  }

  test("prioritySample: growing k extends the sample without " +
    "reshuffling earlier picks; membership is a pure key function") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    def picks(k: Int) = graft.operators.Relational
      .prioritySample(docs, "doc_id", "source", "n_tokens", k)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rn")) ->
        r.getAs[Long]("doc_id")).toMap
    val k3 = picks(3)
    assert(k3 == picks(3), "re-run must reproduce the sample exactly")
    val k5 = picks(5)
    k3.foreach { case (key, id) =>
      assert(k5(key) == id, s"k=5 must extend k=3 at $key") }
    // heavier rows are favored: the sampled docs' mean weight exceeds
    // the corpus mean (weight-proportional selection, DLT property)
    val meanAll = docs.agg(avg("n_tokens")).collect()(0).getDouble(0)
    val meanPicked = graft.operators.Relational
      .prioritySample(docs, "doc_id", "source", "n_tokens", 3)
      .agg(avg("n_tokens")).collect()(0).getDouble(0)
    assert(meanPicked > meanAll,
      s"sampled mean $meanPicked not above corpus mean $meanAll")
    // non-positive weights fail loudly
    val bad = docs.withColumn("n_tokens",
      when(col("doc_id") === 0L, lit(0L)).otherwise(col("n_tokens")))
    val ex = intercept[Exception] {
      graft.operators.Relational
        .prioritySample(bad, "doc_id", "source", "n_tokens", 3).collect()
    }
    assert(ex.getMessage != null)
  }
}

package graft

import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, NTile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-18 engine pins (VERDICT r17 #1): the CCNet tercile pair must
  * keep NTILE's exact semantics while computing them from bounded
  * cut-point tables — no corpus-sized per-domain window partition.
  */
class Round18OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Ragged fixture: domain sizes 1..7 with tie groups engineered to
    * straddle tercile boundaries (every doc in source g3t shares one
    * bits value; g5 has a 3-doc tie across the first cut; g7 mixes
    * singleton and tied values), plus negative bits and non-contiguous
    * doc_ids.
    */
  private def raggedDs(): DataFrame = {
    import spark.implicits._
    val rows = Seq(
      // (doc_id, source, n_words, bits_q8)
      (1L, "g1", 5L, 100L),
      (10L, "g2", 5L, 50L), (11L, "g2", 5L, 50L),
      (20L, "g3t", 5L, 7L), (21L, "g3t", 5L, 7L), (23L, "g3t", 5L, 7L),
      (30L, "g4", 5L, 9L), (31L, "g4", 5L, 8L),
      (32L, "g4", 5L, 8L), (34L, "g4", 5L, 1L),
      (40L, "g5", 5L, 2L), (41L, "g5", 5L, 2L), (42L, "g5", 5L, 2L),
      (44L, "g5", 5L, -3L), (45L, "g5", 5L, 99L),
      (50L, "g7", 5L, 4L), (51L, "g7", 5L, 4L), (52L, "g7", 5L, 4L),
      (53L, "g7", 5L, 4L), (55L, "g7", 5L, 6L), (56L, "g7", 5L, 3L),
      (57L, "g7", 5L, 4L))
    rows.toDF("doc_id", "source", "n_words", "bits_q8")
  }

  test("tercilesByCuts is byte-identical to per-domain NTILE(3) on " +
    "ragged tie-straddling fixtures") {
    val ds = raggedDs()
    val w = Window.partitionBy("source")
      .orderBy(asc("bits_q8"), asc("doc_id"))
    val want = ds
      .withColumn("tercile", ntile(3).over(w).cast("long"))
      .select("doc_id", "source", "n_words", "bits_q8", "tercile")
      .orderBy("source", "doc_id")
      .collect().toSeq
    val got = TextOps.tercilesByCuts(ds)
      .orderBy("source", "doc_id")
      .collect().toSeq
    assert(got == want)
  }

  test("tercilesByCuts matches NTILE on the real surprisal relation " +
    "at sf0.001") {
    val docs = Tables.documents(spark, sf)
    val ds = TextOps.surprisalBits(docs)
      .select("doc_id", "n_words", "bits_q8")
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
    val w = Window.partitionBy("source")
      .orderBy(asc("bits_q8"), asc("doc_id"))
    val want = ds
      .withColumn("tercile", ntile(3).over(w).cast("long"))
      .select("doc_id", "source", "n_words", "bits_q8", "tercile")
      .orderBy("doc_id").collect().toSeq
    val got = TextOps.tercilesByCuts(ds)
      .orderBy("doc_id").collect().toSeq
    assert(want.nonEmpty && got == want)
  }

  private def collectWindows(plan: LogicalPlan): Seq[LWindow] =
    plan.collect { case w: LWindow => w }

  test("ccnetBuckets/ccnetFilter plans contain no NTILE and no window " +
    "partitioned by source alone over the document relation") {
    val docs = Tables.documents(spark, sf)
    for (df <- Seq(TextOps.ccnetBuckets(docs), TextOps.ccnetFilter(docs))) {
      val windows = collectWindows(df.queryExecution.optimizedPlan)
      assert(windows.nonEmpty) // the bounded cut chain does use windows
      windows.foreach { w =>
        assert(!w.windowExpressions.exists(_.exists(_.isInstanceOf[NTile])),
          "NTILE must not appear: terciles are assigned by cut-point " +
            "comparison")
        val parts = w.partitionSpec.collect { case a: Attribute => a.name }
        if (parts == Seq("source")) {
          // a source-only partition is legal ONLY over the bounded
          // (source, bits_q8) value-group table — pinned by requiring
          // that aggregate beneath the window
          val overValueTable = w.child.collectFirst {
            case a: Aggregate if a.groupingExpressions.size == 2 &&
              a.groupingExpressions.collect { case at: Attribute => at.name }
                .sorted == Seq("bits_q8", "source") => a
          }.isDefined
          assert(overValueTable,
            s"window partitioned by source alone must sit over the " +
              s"value-group aggregate, got child:\n${w.child.treeString}")
        } else {
          // the boundary-group ranking partitions by the tie group
          assert(parts.toSet == Set("source", "bits_q8"),
            s"unexpected window partitioning $parts")
        }
      }
    }
  }

  test("knnGraphUpserted's takedown side is a distributed anti-join, " +
    "never an id-literal filter (VERDICT r17 #2)") {
    import graft.operators.SimilarityOps
    val emb = Tables.embeddings(spark, sf)
    val batch = emb.filter(pmod(col("vec_id"), lit(7)) === 3)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        col("embedding"))
    val deletes = emb.filter(pmod(col("vec_id"), lit(9)) === 5)
      .select("vec_id")
    val dir = java.nio.file.Files
      .createTempDirectory("knn_upsert_plan").toString
    val plan = SimilarityOps.knnGraphUpserted(emb, batch, deletes,
      srcDir = s"$sf/embeddings.parquet", outDir = dir,
      probeIds = 0L until 8L, k = 3)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("vec_id#") || !"""(vec_id|q_id)#\d+L? IN \("""
      .r.findFirstIn(plan).isDefined,
      "takedown ids leaked into an IN-literal predicate")
    assert(plan.contains("LeftAnti"), "takedown must anti-join")
  }

  test("bm25 index carries a per-doc dl channel; compaction subtracts " +
    "(N, L) from it and emits the next generation's (r17 ADVICE)") {
    import graft.operators.{RetrievalOps, TextOps}
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 4)
      .withColumn("doc_id", col("doc_id") + lit(30000000L))
    val deletes = docs.filter(pmod(col("doc_id"), lit(7)) === 2)
      .select("doc_id")
    val baseDir = java.nio.file.Files
      .createTempDirectory("bm25_dl_base").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("bm25_dl_gen").toString
    RetrievalOps.bm25CompactWrite(docs, batch, deletes,
      srcDir = s"$sf/documents.parquet", baseDir = baseDir,
      outDir = outDir, batchKey = "spec-dl")
    val survivors = docs.filter(pmod(col("doc_id"), lit(7)) =!= 2)
      .unionByName(batch)
    val wantDl = survivors
      .select(col("doc_id"),
        size(TextOps.words(col("text"))).cast("long").as("dl"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotDl = spark.read.parquet(s"$outDir/dl")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotDl == wantDl)
    // scalars agree with the generation's own dl channel
    val sc = spark.read.parquet(s"$outDir/scalars").collect().head
    assert(sc.getLong(0) == wantDl.size)
    assert(sc.getLong(1) == wantDl.toSeq.map(_._2).sum)
    // df channel is a multi-task word-clustered write, never one file
    for (d <- Seq(s"$baseDir/df", s"$outDir/df")) {
      val parts = new java.io.File(d).listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(parts > 1, s"$d wrote $parts parquet files")
    }
  }

  test("packShardsCompact ≡ from-scratch pack over the merged corpus, " +
    "and refuses a batch overlapping the takedown") {
    import graft.operators.TextOps
    val docs = Tables.documents(spark, sf)
    val merges = TextOps.bpeMerges(docs, rounds = 6, topWords = 31)
    val syms = TextOps.bpeWordSyms(docs, merges, topWords = 31)
    val batch = docs.filter(pmod(col("doc_id"), lit(6)) === 3)
      .withColumn("doc_id", col("doc_id") + lit(20000000L))
    val deletes = docs.filter(pmod(col("doc_id"), lit(11)) === 7)
      .select("doc_id")
    val out = java.nio.file.Files
      .createTempDirectory("pack_cmp_base").toString
    val gen = java.nio.file.Files
      .createTempDirectory("pack_cmp_gen").toString
    val fresh = java.nio.file.Files
      .createTempDirectory("pack_cmp_fresh").toString
    TextOps.packShardsCompact(docs, batch, deletes, syms, 128L, 100L,
      srcDir = s"$sf/documents.parquet", outDir = out, genDir = gen,
      batchKey = "spec")
    val merged = docs.filter(pmod(col("doc_id"), lit(11)) =!= 7)
      .unionByName(batch)
    TextOps.packShardsWrite(merged, syms, 128L, 100L,
      srcDir = s"$sf/documents.parquet", outDir = fresh,
      tokKey = "spec-fresh")
    def rows(dir: String) = spark.read.parquet(dir)
      .select(col("source"), col("shard"), col("bin"),
        md5(concat_ws(" ", col("tokens"))).as("m"))
      .collect().map(_.toString).sorted.toSeq
    val got = rows(gen)
    assert(got.nonEmpty && got == rows(fresh))
    val ex = intercept[IllegalArgumentException] {
      TextOps.packShardsCompact(docs,
        docs.join(deletes.limit(1), Seq("doc_id"), "left_semi"),
        deletes, syms, 128L, 100L,
        srcDir = s"$sf/documents.parquet", outDir = out,
        genDir = java.nio.file.Files
          .createTempDirectory("pack_cmp_clash").toString,
        batchKey = "spec-clash")
    }
    assert(ex.getMessage.contains("disjoint"))
  }

  test("deconIndexUpsert ≡ from-scratch decontaminate over the merged " +
    "benchmark set, and refuses re-added or duplicated bench ids") {
    import graft.operators.DedupOps
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(100)) =!= 0)
    val benchBase = docs.filter(pmod(col("doc_id"), lit(100)) === 0)
    val benchBatch = docs.filter(pmod(col("doc_id"), lit(100)) === 50)
      .withColumn("doc_id", col("doc_id") + lit(40000000L))
    val benchDeletes = docs.filter(pmod(col("doc_id"), lit(300)) === 0)
      .select(col("doc_id").as("bench_id"))
    val baseDir = java.nio.file.Files
      .createTempDirectory("decon_up_base").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("decon_up_gen").toString
    val got = DedupOps.deconIndexUpsert(corpus, benchBase, benchBatch,
      benchDeletes, srcDir = s"$sf/documents.parquet", baseDir = baseDir,
      outDir = outDir, n = 3, minShared = 3, baseKey = "spec",
      batchKey = "spec-up").collect().map(_.toString).toSeq
    val mergedBench = benchBase
      .join(benchDeletes.select(col("bench_id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      .unionByName(benchBatch)
    val want = DedupOps.decontaminate(corpus, mergedBench, n = 3,
      minShared = 3).collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want)
    val reAdd = intercept[IllegalArgumentException] {
      DedupOps.deconIndexUpsert(corpus, benchBase,
        benchBase.limit(1), benchDeletes.limit(0)
          .unionByName(benchBase.limit(1).select(col("doc_id").as("bench_id"))),
        srcDir = s"$sf/documents.parquet", baseDir = baseDir,
        outDir = java.nio.file.Files
          .createTempDirectory("decon_up_readd").toString,
        n = 3, minShared = 3, baseKey = "spec", batchKey = "spec-readd")
    }
    assert(reAdd.getMessage.contains("disjoint"))
    val dup = intercept[IllegalArgumentException] {
      DedupOps.deconIndexUpsert(corpus, benchBase,
        benchBase.filter(pmod(col("doc_id"), lit(300)) =!= 0).limit(1),
        benchDeletes,
        srcDir = s"$sf/documents.parquet", baseDir = baseDir,
        outDir = java.nio.file.Files
          .createTempDirectory("decon_up_dup").toString,
        n = 3, minShared = 3, baseKey = "spec", batchKey = "spec-dup")
    }
    assert(dup.getMessage.contains("NEW"))
  }

  test("knnPlanesRetrainRecall: the stale bucket column loses the " +
    "re-crawled queries' neighbors; the retrained configuration " +
    "recovers them (the churn signal's actionable response)") {
    import graft.operators.SimilarityOps
    val emb = Tables.embeddings(spark, sf)
    val batch = emb.filter(pmod(col("vec_id"), lit(9)) =!= 5 &&
        pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
      .unionByName(emb.filter(pmod(col("vec_id"), lit(7)) === 3)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          col("embedding")))
    val deletes = emb.filter(pmod(col("vec_id"), lit(9)) === 5)
      .select("vec_id")
    val qs = Seq(0L, 10L, 20L, 30L, 40L, 60L, 70L, 80L)
    val rows = SimilarityOps.knnPlanesRetrainRecall(emb, batch, deletes,
      stalePlaneIds = 0L until 8L,
      freshPlaneIds = Seq(0L, 1L, 2L, 3L, 4L, 6L, 7L, 8L),
      queryIds = qs, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 2 * qs.size) // every query present per config
    val mean = rows.groupBy(_._1).view
      .mapValues(rs => rs.map(_._3).sum.toDouble / rs.size).toMap
    assert(mean("retrained") > mean("stale"),
      s"recovery must be visible: $mean")
  }

  test("tercilesByCuts: singleton and two-doc domains fill buckets " +
    "1..2 exactly as NTILE (empty-tercile edge)") {
    import spark.implicits._
    val ds = Seq((1L, "solo", 3L, 10L), (2L, "duo", 3L, 4L),
      (3L, "duo", 3L, 4L))
      .toDF("doc_id", "source", "n_words", "bits_q8")
    val got = TextOps.tercilesByCuts(ds)
      .select("doc_id", "tercile").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 2L)))
  }
}

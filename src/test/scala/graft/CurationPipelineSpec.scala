package graft

import graft.operators.CurationPipeline
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** The composed curation pipeline (VERDICT r11 #1): stage semantics
  * equal the standalone operators' (each is separately oracle-checked;
  * q_pipeline_curate hash-checks the composition), and — the part only
  * a composition test can pin — every stage frame is lineage-truncated
  * exactly once, so no consumer re-executes upstream stages.
  */
class CurationPipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)

  private lazy val input = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    .unionByName(docs.filter(pmod(col("doc_id"), lit(200)) === 0)
      .withColumn("doc_id", col("doc_id") + lit(10000000L)))
  private lazy val bench = docs.filter(pmod(col("doc_id"), lit(100)) === 50)
  private lazy val st = CurationPipeline.stages(input, bench)
  private lazy val acct = CurationPipeline.curate(input, bench).collect()

  test("every stage frame is a truncated checkpoint scan (no upstream recompute)") {
    // After Lineage.truncate the frame's analyzed plan is a LogicalRDD
    // (a scan of materialized blocks) — NOT the stage's derivation
    // chain. Both consumers of each frame (next stage + accounting)
    // therefore read the checkpoint; if someone drops a lineageTruncate
    // this assert fails with the re-derived plan.
    for ((f, name) <- Seq(st.input -> "input",
        st.afterExactDedup -> "d1", st.afterNearDup -> "d2",
        st.afterDecontaminate -> "d3", st.afterQuality -> "d4",
        st.afterDsir -> "d5", st.packedBins -> "bins"))
      assert(f.queryExecution.analyzed.isInstanceOf[LogicalRDD],
        s"stage frame $name is not a checkpoint scan:\n${f.queryExecution.analyzed}")
  }

  test("accounting chain is consistent: rows_in(k) = rows_out(k-1), counts match frames") {
    assert(acct.length === 6)
    assert(acct.map(_.getString(1)).toSeq === Seq("exact_dedup",
      "neardup_canonical", "decontaminate", "quality_filter",
      "dsir_select", "pack"))
    for (i <- 1 until 6)
      assert(acct(i).getLong(2) === acct(i - 1).getLong(3),
        s"rows_in of stage ${i + 1} != rows_out of stage $i")
    // accounting rows are the frames' true counts
    assert(acct(0).getLong(2) === st.input.count())
    assert(acct(0).getLong(3) === st.afterExactDedup.count())
    assert(acct(4).getLong(3) === st.afterDsir.count())
    assert(acct(5).getLong(3) === st.packedBins.count())
  }

  test("stage semantics: filters only (survivors are a subset at every doc stage)") {
    val chain = Seq(st.input, st.afterExactDedup, st.afterNearDup,
      st.afterDecontaminate, st.afterQuality, st.afterDsir)
    for (Seq(prev, cur) <- chain.sliding(2))
      assert(cur.join(prev, Seq("doc_id"), "left_anti").count() === 0L,
        "a stage emitted a doc_id absent from its input")
    // non-vacuous at sf0.001: each of the first five stages drops rows
    for (i <- 0 until 5)
      assert(acct(i).getLong(3) < acct(i).getLong(2),
        s"stage ${i + 1} dropped nothing — vacuous at this SF")
  }

  test("stage 1 equals DedupOps.exactDedup keeper set") {
    val expected = graft.operators.DedupOps.exactDedup(input)
      .select(col("keep_doc_id").as("doc_id"))
    assert(st.afterExactDedup.select("doc_id").except(expected).count() === 0L)
    assert(expected.except(st.afterExactDedup.select("doc_id")).count() === 0L)
  }

  test("stage 6 equals packSequences over the DSIR survivors") {
    val expected = graft.operators.TextOps.packSequences(st.afterDsir, 128L, 100L)
    assert(st.packedBins.except(expected).count() === 0L)
    assert(expected.except(st.packedBins).count() === 0L)
    // pack conserves tokens: bin_tokens total == packer-unit total of d5
    val binTot = st.packedBins.agg(sum("bin_tokens")).collect()(0).getLong(0)
    val d5Tot = st.afterDsir.agg(
      sum(graft.operators.TextOps.tokenCountCol(col("text")))).collect()(0).getLong(0)
    assert(binTot === d5Tot)
    assert(acct(5).getLong(4) === binTot)
  }
}

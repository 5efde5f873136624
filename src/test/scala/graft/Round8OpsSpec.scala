package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** Round-8 hardening: the reliable-checkpoint option on the iterative
  * graph ops (VERDICT r7 #5) — results identical to the localCheckpoint
  * default, with checkpoint data actually written to the caller's
  * directory (the artifact that survives executor loss on a cluster).
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ckDir(): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_reliable_ck")
    d.toFile.deleteOnExit()
    d
  }

  private def rddFileCount(dir: java.nio.file.Path): Long = {
    val s = java.nio.file.Files.walk(dir)
    try s.filter(p => p.getFileName.toString.startsWith("rdd-")).count()
    finally s.close()
  }

  test("connectedComponents(checkpointDir=…) writes reliable checkpoints " +
    "and matches the localCheckpoint default") {
    // two components: a triangle {1,2,3} and a chain 10-11-12
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L))
      .toDF("a_id", "b_id")
    val dir = ckDir()
    val reliable = DedupOps.connectedComponents(pairs,
        checkpointDir = Some(dir.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val default = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == default && reliable ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
    assert(rddFileCount(dir) > 0,
      s"no reliable checkpoint data written under $dir")
  }

  test("pageRankFixedPoint and kCoreFixedRounds accept the reliable path " +
    "with unchanged results") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("a_id", "b_id")
    val dir = ckDir()
    // iterations > PageRankCheckpointEvery so the IN-LOOP truncation
    // (not just the edges/deg setup) exercises the reliable branch
    val iters = DedupOps.PageRankCheckpointEvery + 1
    val prReliable = DedupOps.pageRankFixedPoint(pairs, iters,
        checkpointDir = Some(dir.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prDefault = DedupOps.pageRankFixedPoint(pairs, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prReliable == prDefault, s"$prReliable vs $prDefault")
    val kcReliable = DedupOps.kCoreFixedRounds(pairs, k = 2, rounds = 2,
        checkpointDir = Some(dir.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kcDefault = DedupOps.kCoreFixedRounds(pairs, k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // k=2 peels node 4 (degree 1); the triangle survives
    assert(kcReliable == kcDefault &&
      kcReliable == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(rddFileCount(dir) > 0, s"no checkpoint data under $dir")
  }
}

package graft

/** Drives Bench's REAL measurement pipeline (warmup → min-of-2 timing →
  * target/bench.json → headline render) on a small query subset and
  * strict-parses exactly the string `Bench.main` prints. Rounds 1/2/4
  * each lost or degraded the driver's bench signal to stdout-shape
  * issues ("parsed": null in BENCH_r04.json) — this pins the emitted
  * line end-to-end, not just the renderer.
  */
class BenchRunSpec extends SparkSpec {

  private def parseJson(s: String): com.fasterxml.jackson.databind.JsonNode =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)

  test("runSuite emits one single-line strict-JSON record (the driver-parsed line)") {
    val subset = Seq("q_scan_limit", "q_topk").map(k => k -> SparkEntry.queries(k))
    val line = Bench.runSuite(spark, "/root/testdata/sf0.001", subset)
    // The driver captures the stdout TAIL and json.loads the last line:
    // any embedded newline or non-strict token kills the round's artifact.
    assert(!line.contains("\n") && !line.contains("\r"))
    val parsed = parseJson(line)
    assert(parsed.get("metric").asText() == "total")
    assert(parsed.get("unit").asText() == "sec")
    assert(parsed.get("n").asInt() == 2)
    // Both subset queries succeed at sf0.001, so the total is a real
    // positive elapsed time — bestOf's -1 failure sentinel must not leak.
    assert(parsed.get("value").asDouble() > 0.0)
    // target/bench.json carries the full per-query map for the subset.
    val full = parseJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get("target/bench.json")))
    assert(full.get("queries").size() == 2)
    assert(full.get("queries").get("q_topk").asDouble() > 0.0)
  }

  test("a throwing query surfaces as -1, never as a fast timing") {
    val boom: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (_, _) => throw new RuntimeException("synthetic failure")
    val line = Bench.runSuite(spark, "/root/testdata/sf0.001",
      Seq("q_scan_limit" -> SparkEntry.queries("q_scan_limit"), "q_boom" -> boom))
    val full = parseJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get("target/bench.json")))
    assert(full.get("queries").get("q_boom").asDouble() == -1.0)
    assert(full.get("queries").get("q_scan_limit").asDouble() > 0.0)
    assert(parseJson(line).get("metric").asText() == "total")
  }
}

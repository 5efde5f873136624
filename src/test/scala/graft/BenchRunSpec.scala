package graft

/** Drives Bench's REAL measurement pipeline (warmup → min-of-2 timing →
  * bench-json sidecar → headline render) on a small query subset and
  * strict-parses exactly the string `Bench.main` prints. Rounds 1/2/4
  * each lost or degraded the driver's bench signal to stdout-shape
  * issues ("parsed": null in BENCH_r04.json) — this pins the emitted
  * line end-to-end, not just the renderer.
  *
  * The spec writes its sidecar to a TEMP path: a real `Bench.main` run
  * leaves `target/bench.json` behind as the round's full per-query
  * artifact, and a later `sbt test` must not clobber it with the
  * two-query fixture map.
  */
class BenchRunSpec extends SparkSpec {

  private def parseJson(s: String): com.fasterxml.jackson.databind.JsonNode =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)

  private def tmpJson(): java.nio.file.Path =
    java.nio.file.Files.createTempFile("graft_bench_spec", ".json")

  test("runSuite emits one single-line strict-JSON record (the driver-parsed line)") {
    val subset = Seq("q_scan_limit", "q_topk").map(k => k -> SparkEntry.queries(k))
    val sidecar = tmpJson()
    val line = Bench.runSuite(spark, "/root/testdata/sf0.001", subset,
      sidecar.toString)
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
    // the sidecar carries the full per-query map for the subset.
    val full = parseJson(java.nio.file.Files.readString(sidecar))
    assert(full.get("queries").size() == 2)
    assert(full.get("queries").get("q_topk").asDouble() > 0.0)
    java.nio.file.Files.deleteIfExists(sidecar)
  }

  test("a throwing query surfaces as -1, never as a fast timing") {
    val boom: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (_, _) => throw new RuntimeException("synthetic failure")
    val sidecar = tmpJson()
    val line = Bench.runSuite(spark, "/root/testdata/sf0.001",
      Seq("q_scan_limit" -> SparkEntry.queries("q_scan_limit"), "q_boom" -> boom),
      sidecar.toString)
    val full = parseJson(java.nio.file.Files.readString(sidecar))
    assert(full.get("queries").get("q_boom").asDouble() == -1.0)
    assert(full.get("queries").get("q_scan_limit").asDouble() > 0.0)
    assert(parseJson(line).get("metric").asText() == "total")
    java.nio.file.Files.deleteIfExists(sidecar)
  }
}

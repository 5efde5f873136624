package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle_sql.json writer is a single point of failure for the whole
  * correctness round: if any oracle string breaks the driver's
  * json.load, every query's verdict zeroes. Pin the escape rules and
  * round-trip the REAL oracle map through a strict JSON parser.
  */
class VerifyJsonSpec extends AnyFunSuite {

  private def parseJson(s: String): com.fasterxml.jackson.databind.JsonNode =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)

  test("jsonQuote escapes quotes, backslashes and control chars") {
    val nasty = "a\"b\\c\nd\re\tfg"
    val parsed = parseJson(s"{${Verify.jsonQuote("k")}: ${Verify.jsonQuote(nasty)}}")
    assert(parsed.get("k").asText() == nasty)
  }

  test("Bench result line parses strictly with every declared query present") {
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 0.1234567)
    val full = Bench.renderJson(results, "/root/testdata/sf0.1", results.map(_._1))
    val parsed = parseJson(full)
    assert(parsed.get("metric").asText() == "total")
    assert(parsed.get("unit").asText() == "sec")
    assert(parsed.get("n").asInt() == SparkEntry.queries.size)
    assert(parsed.get("queries").size() == SparkEntry.queries.size)
    assert(math.abs(parsed.get("queries").get("q_topk").asDouble() - 0.123) < 1e-9)
    assert(math.abs(parsed.get("value").asDouble() -
      0.1234567 * SparkEntry.queries.size) < 0.001 * SparkEntry.queries.size)
  }

  test("printed headline line stays under the driver tail-capture budget") {
    // Rounds 1 and 2 both lost their bench signal: the full per-query
    // line (~2.3 KB) overflowed the ~2 KB stdout-tail capture window,
    // truncating the opening brace. The PRINTED line uses the headline
    // subset and must stay far below that window even after sbt's
    // "[success] Total time …" trailer (~80 bytes) is appended.
    Bench.headline.foreach { q =>
      assert(SparkEntry.queries.contains(q), s"headline query $q not declared")
    }
    // the sampling rule's spec-enforced invariants (r18, VERDICT r17
    // #8): controls and varianceTier keys always ride the line
    val online = Bench.headline.toSet
    Bench.controls.foreach(c =>
      assert(online(c), s"control $c fell off the headline"))
    Bench.varianceTier.foreach(v =>
      assert(online(v), s"varianceTier key $v fell off the headline"))
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 123.4567891)
    // worst-case ctrl_cs block: one row per controlEvery positions plus
    // the final row, every sample 5 digits (a 123 s control)
    val ctrlRowCount = results.size / Bench.controlEvery + 1
    val ctrl = (0 until ctrlRowCount).map(i =>
      (results.size - 1) -> Bench.controls.map(_ => 123.4567891))
    val line = Bench.renderJson(results, "/root/testdata/sf0.1",
      Bench.headline, ctrl)
    assert(line.length < 1500, s"printed bench line too long: ${line.length}")
    val parsed = parseJson(line)
    assert(parsed.get("queries").size() == Bench.headline.size)
    assert(parsed.get("n").asInt() == SparkEntry.queries.size)
    assert(parsed.get("ctrl_cs").size() == ctrlRowCount)
    assert(parsed.get("ctrl_cs").get(0).size() == Bench.controls.size + 1)
    assert(parsed.get("ctrl_cs").get(0).get(1).asInt() == 12346)
  }

  test("ctrl_cs rows render positions, centiseconds, and -1 failures") {
    val results = Seq("q_a" -> 1.0, "q_b" -> 2.0)
    val line = Bench.renderJson(results, "sf", Seq("q_a"),
      Seq(49 -> Seq(0.245, -1.0), 99 -> Seq(0.305, 0.62)))
    val parsed = parseJson(line)
    val c = parsed.get("ctrl_cs")
    assert(c.get(0).get(0).asInt() == 49)
    assert(c.get(0).get(1).asInt() == 25)   // 0.245 s → 25 cs (rounded)
    assert(c.get(0).get(2).asInt() == -1)   // failed sample
    assert(c.get(1).get(0).asInt() == 99)
    assert(c.get(1).get(2).asInt() == 62)
    // every control key must itself be a declared query
    Bench.controls.foreach(c =>
      assert(SparkEntry.queries.contains(c), s"control $c not declared"))
    // no-ctrl rendering stays byte-identical to the r16 format
    assert(!Bench.renderJson(results, "sf", Seq("q_a")).contains("ctrl_cs"))
  }

  test("bestOf takes the min of fresh samples") {
    // min-of-2 is the noise shield for the driver's binding artifact
    // (r3 recorded a host-load 34 s outlier that re-timed at 1.8 s).
    var i = 0
    val v = Bench.bestOf(2) { i += 1; if (i == 1) 34.1 else 1.8 }
    assert(v == 1.8 && i == 2)
  }

  test("bestOf never lets a fast failure shadow a slow success") {
    // A query that succeeds slowly on run 1 but throws instantly on run 2
    // must record the slow SUCCESS, not the near-zero time-to-throw.
    var i = 0
    val v = Bench.bestOf(2) { i += 1; if (i == 1) 34.1 else Bench.FailedSample }
    assert(v == 34.1 && i == 2)
    // Only when EVERY sample fails does the query report -1.
    assert(Bench.bestOf(3)(Bench.FailedSample) == -1.0)
    // timeOnce is the sample producer: throw ⇒ FailedSample, not elapsed.
    assert(Bench.timeOnce(throw new RuntimeException("boom")) == Bench.FailedSample)
    assert(Bench.timeOnce(()) >= 0.0)
  }

  test("the actual oracle map round-trips through strict JSON") {
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Verify.jsonQuote(k)}: ${Verify.jsonQuote(v)}" }
      .mkString("{", ",", "}")
    val parsed = parseJson(json)
    assert(parsed.size() == SparkEntry.oracleSql.size)
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(parsed.get(k).asText() == v, s"round-trip mismatch for $k")
    }
  }
}

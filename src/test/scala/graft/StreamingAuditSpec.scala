package graft

import java.sql.Timestamp

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Pins [[StreamingOps.progressAudit]]: the dropped-by-watermark counter
  * is the metric that distinguishes "input volume dipped" from "the
  * pipeline silently discarded late data" — a production stream alarms
  * on it, so the rollup must actually surface drops when they happen.
  */
class StreamingAuditSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("progressAudit surfaces watermark-dropped rows and state size") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, Long)]
    val events = input.toDF().toDF("ts_ts", "event_type", "value", "user_id")
    val q = StreamingOps.toMemorySink(
      StreamingOps.tumblingCounts(events, watermark = "10 minutes"),
      "audit_test", "update")
    try {
      // batch 1 advances the watermark to 12:00 - 10min = 11:50
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0, 1L),
        (ts("2024-01-01 12:00:00"), "click", 2.0, 1L))
      q.processAllAvailable()
      // batch 2: an event a full hour behind the watermark — dropped
      input.addData((ts("2024-01-01 10:30:00"), "view", 3.0, 2L))
      q.processAllAvailable()
      val audit = StreamingOps.progressAudit(q)
      assert(audit("rows_in") === 3L)
      assert(audit("rows_dropped_by_watermark") >= 1L,
        s"late row was not counted as dropped: $audit")
      assert(audit("state_rows_latest") >= 1L)
      assert(audit("batches") >= 2L)
      // and the dropped row never reached the sink
      assert(spark.table("audit_test")
        .filter("event_type = 'view'").count() === 0)
    } finally q.stop()
  }
}

package graft

import java.sql.Timestamp

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch↔streaming EQUIVALENCE for sessionization: `session_window`
  * (Spark's built-in, the batch/q_window_session path) and
  * `sessionizeWithState` (the custom flatMapGroupsWithState operator)
  * are two independent implementations of one semantics — same gap,
  * same data must mean same sessions. The feed is deliberately
  * OUT of timestamp order inside the micro-batch, so the state
  * operator's in-batch sort is load-bearing, and includes a chained
  * extension (events each within gap of the previous but spanning
  * 3× the gap total) — the shape where naive windowing and true
  * gap-chaining semantics diverge.
  *
  * Boundary convention: `session_window.end` is last-event + gap;
  * the state operator emits last-event itself. The comparison uses
  * (user, start, LAST EVENT, n) on both sides.
  */
class SessionParitySpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("session_window and sessionizeWithState produce identical sessions") {
    val rows = Seq(
      // user 1: two sessions (25-min break), fed out of order
      (t("2024-01-01 10:30:00"), "c", 1.0, 1L),
      (t("2024-01-01 10:00:00"), "c", 1.0, 1L),
      (t("2024-01-01 10:05:00"), "c", 1.0, 1L),
      // user 2: chained 9-min steps spanning 27 min — ONE session
      (t("2024-01-01 10:18:00"), "c", 1.0, 2L),
      (t("2024-01-01 10:00:00"), "c", 1.0, 2L),
      (t("2024-01-01 10:09:00"), "c", 1.0, 2L),
      (t("2024-01-01 10:27:00"), "c", 1.0, 2L),
      // user 3: singleton
      (t("2024-01-01 11:00:00"), "c", 1.0, 3L))

    val batch = rows.toDF("ts_ts", "event_type", "value", "user_id")
      .groupBy(session_window(col("ts_ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), max(col("ts_ts")).as("last_ev"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("last_ev"), col("n"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSet

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, Long)]
    val events = input.toDF().toDF("ts_ts", "event_type", "value", "user_id")
    val q = StreamingOps.toMemorySink(
      StreamingOps.sessionizeWithState(events, gapMinutes = 10),
      "session_parity", "append")
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // sentinel a day later: advances the watermark past every open
      // session's timeout so all remaining sessions flush
      input.addData((t("2024-01-02 12:00:00"), "c", 1.0, 99L))
      q.processAllAvailable()
      val stream = spark.table("session_parity").filter("user_id <> 99")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSet
      assert(stream === batch,
        s"stream sessions $stream != batch sessions $batch")
      assert(batch.size === 4) // 2 + 1 + 1 — the shapes actually exercised
    } finally q.stop()
  }
}

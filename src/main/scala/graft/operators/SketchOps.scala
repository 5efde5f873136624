package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency-sketch operators (SURVEY.md §2 K extensions): count-min —
  * the streaming-frequency sketch every heavy-hitter pipeline carries
  * alongside the membership (bloom) and cardinality (HLL) sketches this
  * engine already ships.
  *
  * Unlike HLL/t-digest (engine-specific internals → rows-only checks),
  * the CMS here is built on the engine-portable [[DedupOps.md5Hash60]]
  * hash, so a DuckDB oracle replays the EXACT counter table and the
  * declared query is hash-checkable end-to-end — a fully verified sketch.
  */
object SketchOps {

  /** (depth, slot) cell coordinates for a key column — one struct per
    * hash row, shared by build, lookup, AND the streaming maintenance
    * path ([[graft.streaming.StreamingOps.streamingCmsCounts]]) so the
    * three can never drift onto different hash cells.
    */
  private[graft] def cells(keyCol: String, depth: Int, width: Int) =
    array((0 until depth).map { d =>
      struct(lit(d).as("d"),
        pmod(DedupOps.md5Hash60(concat(lit(s"$d:"), col(keyCol))),
          lit(width.toLong)).as("slot"))
    }: _*)

  /** Build a count-min sketch over `rows[keyCol]`: counter table
    * (d, slot, cnt) with depth·width cells. ONE map-side-combined
    * groupBy whose key space is bounded by depth·width — at 100 TB the
    * shuffle carries at most depth·width rows per map task regardless of
    * corpus size, which is the whole point of sketching the frequency
    * table instead of materializing it.
    */
  def cmsBuild(rows: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1)
    rows.select(explode(cells(keyCol, depth, width)).as("ds"))
      .groupBy(col("ds.d").as("d"), col("ds.slot").as("slot"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch for every row of `keys` (which must carry
    * `keyCol`; other columns ride along): est_cnt = min over the depth
    * rows of the key's counter, the classic CMS estimate — an upper
    * bound on the true count, exact when no colliding key shares all
    * probed cells. The counter table is depth·width rows → broadcast;
    * keys never shuffle beyond their own grouping.
    */
  def cmsLookup(cms: DataFrame, keys: DataFrame, keyCol: String,
                depth: Int, width: Int): DataFrame = {
    val keyCols = keys.columns.toSeq
    val probes = keys
      .select(keyCols.map(col) :+ explode(cells(keyCol, depth, width)).as("ds"): _*)
      .select(keyCols.map(col) :+ col("ds.d").as("d") :+ col("ds.slot").as("slot"): _*)
    probes.join(broadcast(cms), Seq("d", "slot"), "left")
      .groupBy(keyCols.map(col): _*)
      // an absent cell is a zero counter (key never seen): coalesce
      // BEFORE the min so unseen keys estimate 0, not null
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }
}

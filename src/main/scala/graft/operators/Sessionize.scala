package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the telemetry-pipeline staple the reference's
  * fixed transaction scope (one binlog file = one session) never needed:
  * long-running agent conversations must be split into sessions wherever
  * the inter-turn gap exceeds a threshold (idle user, crashed agent), so
  * downstream training-data windows don't span unrelated activity.
  *
  * Implementation is two running-frame window passes over the SAME
  * (conv_id, turn_idx) sort the txn-stamp window already establishes —
  * on the composed pipeline Catalyst reuses the exchange, so
  * sessionization rides the existing shuffle instead of adding one.
  * No O(partition²) frames (see [[TxnStamp]]).
  */
object Sessionize {

  /** Adds `session_seq` (1-based per conversation) and `session_id`.
    * A turn starts a new session iff it is the conversation's first turn
    * or its gap to the previous turn exceeds `gapSeconds`.
    */
  def sessionize(turns: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NTZ timestamps refuse a direct long cast; hop through TIMESTAMP
    // (session tz = UTC) — floor-of-epoch-seconds in both engines.
    def sec(c: Column): Column = c.cast("timestamp").cast("long")
    val prevTs = lag(col("ts"), 1).over(w)
    val isNew = when(prevTs.isNull
      || sec(col("ts")) - sec(prevTs) > gapSeconds, 1L).otherwise(0L)
    turns
      .withColumn("session_seq", sum(isNew).over(running))
      .withColumn("session_id",
        concat(col("conv_id"), lit("#"), col("session_seq").cast("string")))
  }

  /** Per-session envelope (bounds + size) — the aggregate consumers key on. */
  def sessionBounds(sessionized: DataFrame): DataFrame =
    sessionized.groupBy("conv_id", "session_seq")
      .agg(
        min(col("turn_idx")).as("first_turn"),
        max(col("turn_idx")).as("last_turn"),
        count(lit(1)).as("n_turns"),
        min(col("ts")).as("started_at"),
        max(col("ts")).as("ended_at"))
}

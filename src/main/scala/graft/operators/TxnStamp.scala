package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transaction semantics — replaces the reference's sequential
  * RowsEventBuffer + drain-on-XID (`parser/parser/rows_event_buffer.go:7-24`,
  * `binlog_to_messages.go:41-54`) with a window function: the commit's xid
  * is propagated BACKWARD onto every buffered row event of the same
  * conversation (fixture 07 proves two row events share XId=456 while
  * keeping their own positions — `data/fixtures/07.json:17-18,34-35`).
  *
  * Batch semantics: txn_id(turn) = xid of the first commit at or after the
  * turn within its conversation. Row events with no following commit were
  * never drained by the reference (buffer discarded at EOF) — they carry
  * txn_id null here and are dropped-with-count downstream.
  *
  * Cost model at scale: exactly ONE shuffle (hash exchange on conv_id); the
  * window sort on (conv_id, turn_idx) is reused by every downstream
  * per-conversation computation. Conversations are bounded (≤ thousands of
  * turns), so no single partition key can exceed executor memory; skew from
  * hot conversations is handled by the salting path in [[Skew]].
  */
object TxnStamp {

  def stamp(parsed: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    parsed.withColumn("txn_id",
      first(when(col("kind") === "commit", col("xid")), ignoreNulls = true).over(w))
  }
}

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

  /** Skew-safe salted variant — semantically identical to [[stamp]] (tested
    * + oracle-checked), but a hot conversation no longer serializes into one
    * task: rows are windowed per (conv_id, block) where
    * block = turn_idx div blockSize, then rows whose commit lies in a later
    * block are backfilled from a tiny per-block summary.
    *
    * Cost: the big frame is exchanged once on (conv_id, block) — same as the
    * plain window but with bounded partition-key cardinality — plus a
    * negligible summary aggregation/join (rows ≈ nBlocks, not turns). This
    * is the "salted repartitioning for hot conversations" the north rule
    * demands; the salt boundary is txn-safe because commit stamping is the
    * only cross-row dependency and it is restored by the backfill join
    * (update pairing is within-row, SURVEY.md §7.4).
    */
  def stampSalted(parsed: DataFrame, blockSize: Int = 4096): DataFrame = {
    val block = (col("turn_idx").cast("long") / blockSize).cast("long").as("salt_block")
    val withBlock = parsed.withColumn("salt_block", block)

    val wIn = Window.partitionBy("conv_id", "salt_block").orderBy("turn_idx")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val inBlock = withBlock.withColumn("txn_in_block",
      first(when(col("kind") === "commit", col("xid")), ignoreNulls = true).over(wIn))

    // Tiny per-(conv, block) summary: xid of the block's FIRST commit.
    val summary = withBlock
      .filter(col("kind") === "commit")
      .groupBy("conv_id", "salt_block")
      .agg(min(struct(col("turn_idx"), col("xid"))).getField("xid").as("first_xid"))
    // For each block in the full (conv, block) domain: xid of the first
    // commit in any STRICTLY LATER block (commits at-or-after the row in its
    // own block were already caught by the in-block window).
    val blockDomain = withBlock.select("conv_id", "salt_block").distinct()
    val domainFill = blockDomain
      .join(summary, Seq("conv_id", "salt_block"), "left")
      .withColumn("next_xid",
        first(col("first_xid"), ignoreNulls = true).over(
          Window.partitionBy("conv_id").orderBy("salt_block")
            .rowsBetween(1, Window.unboundedFollowing)))
      .select(col("conv_id"), col("salt_block"), col("next_xid"))

    inBlock
      .join(domainFill, Seq("conv_id", "salt_block"), "left")
      .withColumn("txn_id", coalesce(col("txn_in_block"), col("next_xid")))
      .drop("txn_in_block", "next_xid", "salt_block")
  }
}

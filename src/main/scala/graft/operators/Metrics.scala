package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass pipeline metrics — the distributed analog of the reference's
  * glog drop counters (`binlog_to_messages.go:85`, `conversion.go:82`).
  *
  * Uses `Dataset.observe`: the counters are accumulated DURING the job that
  * materializes the pipeline (no second scan, unlike [[Agg.reconcile]],
  * which is the standalone/oracle-checkable form). Attach to the enriched
  * frame, run any action downstream, then read `observation.get`.
  */
object Metrics {

  def observe(enriched: DataFrame, observation: Observation): DataFrame = {
    val isRow = col("kind").isin("insert", "update", "delete")
    enriched.observe(
      observation,
      count(lit(1)).as("turns"),
      sum(when(isRow, 1L).otherwise(0L)).as("row_events"),
      sum(when(col("kind") === "query" && col("suppressed"), 1L).otherwise(0L)).as("query_suppressed"),
      sum(when(col("kind") === "", 1L).otherwise(0L)).as("noise"),
      sum(when(isRow && !col("matched"), 1L).otherwise(0L)).as("dropped_unmapped"),
      sum(when(isRow && col("matched") && col("txn_id").isNull, 1L).otherwise(0L)).as("dropped_uncommitted"),
      sum(when(isRow && col("matched") && (size(col("vals")) % 2 === 1) &&
        (col("kind") === "update"), 1L).otherwise(0L)).as("quarantined_odd_updates"))
  }
}

package graft

import graft.operators._
import graft.sources.Transcripts
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pipeline composition — the `parse → enrich → route → aggregate` DAG.
  * Each stage is a pure DataFrame→DataFrame function (independently
  * testable, like the reference's library entry points
  * `parser/binlog_parser.go:9-15`); `Pipeline` just composes them.
  *
  * Plan shape (verified via explain in tests): one parquet scan →
  * WholeStageCodegen(parse) → single hash Exchange on conv_id → Sort +
  * WindowExec (txn stamp) → BroadcastHashJoin (lookup) → Generate(explode)
  * → Filter → output. Exactly one shuffle end-to-end.
  */
case class PipelineConfig(
    includeRoles: Seq[String] = Nil,
    includeTools: Seq[String] = Nil,
    /** When set, use the skew-safe salted txn stamping with this block size
      * (see [[graft.operators.TxnStamp.stampSalted]]); None = plain window.
      */
    saltBlockSize: Option[Int] = None)

object Pipeline {

  /** Parsed + txn-stamped + lookup-enriched turns (pre-explode). */
  def enriched(turns: DataFrame, lookup: DataFrame,
      cfg: PipelineConfig = PipelineConfig()): DataFrame = {
    val parsed = Parse.parse(turns)
    val stamped = cfg.saltBlockSize match {
      case Some(sz) => TxnStamp.stampSalted(parsed, sz)
      case None => TxnStamp.stamp(parsed)
    }
    Enrich.withLookup(stamped, lookup)
  }

  /** Full routed message stream. */
  def routed(turns: DataFrame, lookup: DataFrame,
      cfg: PipelineConfig = PipelineConfig()): DataFrame =
    Route.includeFilters(Route.messages(enriched(turns, lookup, cfg)),
      cfg.includeRoles, cfg.includeTools)

  /** Convenience: routed stream over the sfDir-derived transcript table. */
  def routedFromEvents(spark: SparkSession, sfDir: String,
      cfg: PipelineConfig = PipelineConfig()): DataFrame =
    routed(Transcripts.fromEvents(spark, sfDir), Transcripts.lookup(spark), cfg)
}

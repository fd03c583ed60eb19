package graft

import graft.operators._
import graft.sources.Transcripts
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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

  /** Parsed + txn-stamped + lookup-enriched turns (pre-explode).
    *
    * Parse order (guide §2.3 "project before the exchange"): only the
    * dispatch columns the txn-stamp window needs (kind, xid — cheap
    * substring extractions) are computed BEFORE the conv_id exchange; the
    * wide `vals` payload decode and stmt extraction run AFTER it, in the
    * post-shuffle stage. `vals` serializes to roughly the text bytes again
    * plus array offsets, so parsing it pre-shuffle nearly doubled every
    * shuffled row's width for no benefit — the window never reads it.
    * Result columns/values are identical to stamping Parse.parse output
    * (oracle- and spec-checked); only the stage that computes them moves.
    */
  def enriched(turns: DataFrame, lookup: DataFrame,
      cfg: PipelineConfig = PipelineConfig()): DataFrame = {
    val parsed = Parse.parseKind(turns)
    val stamped = cfg.saltBlockSize match {
      case Some(sz) => TxnStamp.stampSalted(parsed, sz)
      case None => TxnStamp.stamp(parsed)
    }
    Enrich.withLookup(Parse.withVals(stamped), lookup)
  }

  /** Role include-filter, pushed AHEAD of parse (VERDICT r01 #6): every
    * message inherits its turn's role verbatim, so non-matching turns can
    * be dropped at the SCAN (Parquet row-group skipping via pushed
    * In/StartsWith filters) instead of riding the whole
    * parse→shuffle→window→explode pipeline to be discarded at the end —
    * at 100 TB an unpushed role filter wastes the entire run on dropped
    * rows. Commit turns must survive regardless of role: they drive txn
    * stamping for OTHER roles' row events (the reference stamps XId in the
    * parser, before any predicate — `binlog_to_messages.go:41-54` vs
    * `consumer_chain.go:83-91`). Commits and blank roles emit no /
    * unconditionally-passing messages, so the residual message-level
    * filter in [[Route.includeFilters]] stays semantically identical.
    *
    * The tool filter can NOT pre-filter: query messages rewrite tool to
    * "(unknown)" (`Route.messages`), so a message's tool is not the turn's.
    */
  private def pushRoleFilter(turns: DataFrame, includeRoles: Seq[String]): DataFrame =
    if (includeRoles.isEmpty) turns
    else turns.filter(
      col("role") === "" || col("role").isin(includeRoles: _*) ||
        col("text").startsWith("EVENT commit "))

  /** Full routed message stream. */
  def routed(turns: DataFrame, lookup: DataFrame,
      cfg: PipelineConfig = PipelineConfig()): DataFrame =
    Route.includeFilters(
      Route.messages(enriched(
        pushRoleFilter(turns, cfg.includeRoles), lookup, cfg)),
      cfg.includeRoles, cfg.includeTools)

  /** Convenience: routed stream over the sfDir-derived transcript table. */
  def routedFromEvents(spark: SparkSession, sfDir: String,
      cfg: PipelineConfig = PipelineConfig()): DataFrame =
    routed(Transcripts.fromEvents(spark, sfDir), Transcripts.lookup(spark), cfg)
}

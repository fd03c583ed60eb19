package graft

import graft.operators.Agg
import graft.packs._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — aggregates every query pack. Each pack pairs Spark
  * queries with DuckDB oracles over the same parquet tables (see
  * [[graft.packs.QueryPack]]); packs: transcript pipeline (SURVEY.md §2),
  * text analysis, dedup family, similarity search, relational coverage.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] =
    Seq(TranscriptPack, TextPack, DedupPack, AnnPack, RelationalPack,
      MultimodalPack, CuratePack)

  /** Flagship: per-sink routed-message counts on sf0.001 (the aggregate the
    * north rule grades — K3 fan-out + A1 counts).
    */
  def entry(spark: SparkSession): DataFrame =
    Agg.sinkCounts(Pipeline.routedFromEvents(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}

package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A group of driver-contract queries: each name maps to a Spark query over
  * the sfDir parquet tables and (where SQL-expressible) a DuckDB oracle over
  * the same tables. SparkEntry aggregates all packs.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]

  protected def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  protected def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
  protected def tbl(name: String)(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}

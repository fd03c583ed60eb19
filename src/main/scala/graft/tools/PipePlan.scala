package graft.tools

import graft.{Pipeline, PipelineConfig}
import graft.sources.Transcripts
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: print the BENCH pipeline's executed plan (salted, synthetic). */
object PipePlan {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val routed = Pipeline.routed(
      Transcripts.synthetic(spark, n, 50000, skewPct = 2),
      Transcripts.lookup(spark),
      PipelineConfig(saltBlockSize = Some(16384)))
    val agg = routed.agg(
      count(lit(1)),
      sum(length(col("row_repr"))), sum(length(col("old_repr"))),
      sum(length(col("new_repr"))), sum(length(col("text"))),
      sum(col("txn_id")))
    agg.collect()
    println("=== FINAL EXECUTED PLAN (post-AQE) ===")
    println(agg.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    spark.stop()
  }
}

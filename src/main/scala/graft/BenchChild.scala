package graft

import graft.sources.Transcripts
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One scaling-measurement point, isolated in its own JVM (spawned by
  * [[Bench]]): measuring local[N] and local[4N] inside one JVM is invalid —
  * the second session inherits an aged heap and the first session's
  * orphaned spark.local.dir files; the identical job measured 34.5 s fresh
  * vs 115 s as a second session.
  *
  * args: cpus nTurns shufflePartitions. Prints `GRAFT_CHILD_SEC=<sec>`.
  */
object BenchChild {

  def pipelineRun(spark: SparkSession, nTurns: Long): Double = {
    val turns = Transcripts.synthetic(spark, nTurns, nConvs = 50000, skewPct = 2)
    val routed = Pipeline.routed(turns, Transcripts.lookup(spark),
      PipelineConfig(saltBlockSize = Some(65536)))
    val t0 = System.nanoTime()
    routed.agg(
      count(lit(1)),
      sum(length(col("row_repr"))), sum(length(col("old_repr"))),
      sum(length(col("new_repr"))), sum(length(col("text"))),
      sum(col("txn_id"))).collect()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val Array(cpus, nTurns, parts) = args.map(_.toLong)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-child-$cpus")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    pipelineRun(spark, nTurns / 20) // warmup: JIT + codegen
    val sec = pipelineRun(spark, nTurns)
    println(s"GRAFT_CHILD_SEC=$sec")
    spark.stop()
  }
}

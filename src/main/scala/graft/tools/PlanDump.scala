package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main (not driver contract): dump `.explain("formatted")` for
  * named SparkEntry queries to files — the plans/r06/ evidence the
  * optimization round commits alongside its claims.
  *
  * args: outDir [comma-list of query names (default: all batch queries)]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (Bench parity configs).
  * Streaming-harness queries (g2_txn_stamp_streaming, k4_windowed_counts,
  * x4_session_window_stream, dedup_stream_*) execute a streaming query
  * inside their builder; their returned memory table has no meaningful
  * batch plan, so they are skipped unless explicitly named.
  */
object PlanDump {

  private val streamingHarness = Set("g2_txn_stamp_streaming",
    "k4_windowed_counts", "x4_session_window_stream",
    "dedup_stream_exact", "dedup_stream_watermark")

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "after")
    val names =
      if (args.length > 1) args(1).split(",").map(_.trim).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
        .filterNot(streamingHarness)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"[plan] $name -> $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plan] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.packs.Replay
import graft.sources.Transcripts

/** Scratch diagnostic main (not part of the driver contract): times the
  * k4 streaming harness phase by phase and dumps per-batch progress.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val parts = if (args.length > 1) args(1) else "4"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // warmup pipeline codegen like the bench does
    timed("warmup-batch-route") {
      graft.operators.Agg.sinkCounts(graft.Pipeline.routedFromEvents(spark, dir)).count()
    }
    // optional: run a comma-list of SparkEntry queries first (bench-order
    // residue reproduction), timing each like the bench does
    if (args.length > 2) args(2).split(",").foreach { name =>
      timed(name)(graft.SparkEntry.queries(name)(spark, dir).count())
    }
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", parts)
    Replay.withReplayDir("graft-probe") { replayDir =>
      val turns = Transcripts.fromEvents(s, dir)
        .selectExpr("conv_id", "turn_idx", "role", "text", "tool", "ts")
      timed("replay-write")(turns.write.mode("overwrite").parquet(replayDir))
      println("PROBE replay files: " + new java.io.File(replayDir)
        .listFiles().count(_.getName.endsWith(".parquet")))
      val input = s.readStream.schema(graft.model.Model.turnsSchema).parquet(replayDir)
      val routed = graft.streaming.StreamingPipeline.routedStream(input, Transcripts.lookup(s))
      val counts = graft.streaming.StreamingPipeline.windowedSinkCounts(routed)
        .select(col("window.start").as("win_start"),
          col("role"), col("tool"), col("event_type"), col("n"))
      val q = counts.writeStream.format("memory").queryName("probe_k4")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      timed("k4-stream")(q.awaitTermination())
      q.recentProgress.foreach { p =>
        println(s"PROBE batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
        p.stateOperators.foreach(so => println(
          s"PROBE   state op: rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} commitMs=${so.allUpdatesTimeMs}/${so.commitTimeMs} mem=${so.memoryUsedBytes}"))
      }
      q.stop()
    }
    spark.stop()
  }
}

package graft.checkpoint

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Fan-out sink + snapshot/manifest checkpointing.
  *
  * The reference's collector fan-out (`consumer_chain.go:50-58`) writes every
  * passing message to every collector; here the fan-out is ONE dynamic
  * partitioned write — `partitionBy(bucket, role, tool, event_type)` — so
  * each sink "table" is a partition subtree, written in a single pass with
  * no per-sink re-scan.
  *
  * Resumability (north rule): work is sharded into `nBuckets` conversation
  * buckets (`pmod(xxhash64(conv_id), n)` — conversations never straddle
  * buckets, so every transactional semantic is bucket-local). A bucket's
  * manifest is written only after its data is fully committed; resume
  * re-derives the pending set from the manifest dir and recomputes ONLY
  * those buckets (`partitionOverwriteMode=dynamic` makes the re-write of a
  * half-finished bucket idempotent). Manifests carry lineage (source, bucket,
  * conv/turn ranges) + per-sink counts — the Iceberg-snapshot analog, Parquet
  * + JSON here because no Iceberg runtime jar ships in this sandbox
  * (documented in BASELINE.md).
  */
object Sinks {

  val BucketCol = "bucket"

  def withBucket(routed: DataFrame, nBuckets: Int): DataFrame =
    routed.withColumn(BucketCol, pmod(xxhash64(col("conv_id")), lit(nBuckets)).cast("int"))

  private def manifestDir(outDir: String) = Paths.get(outDir, "_manifests")

  def completedBuckets(outDir: String): Set[Int] = {
    val dir = manifestDir(outDir)
    if (!Files.isDirectory(dir)) Set.empty
    else Files.list(dir).iterator.asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("bucket-") && n.endsWith(".json"))
      .map(n => n.stripPrefix("bucket-").stripSuffix(".json").toInt)
      .toSet
  }

  /** Write (only) the pending buckets of the routed stream, then commit one
    * manifest per newly completed bucket. Returns the number of buckets
    * written. A crash before manifests leaves re-runnable buckets; a crash
    * after some manifests resumes with exactly the rest.
    */
  def writeResumable(routed: DataFrame, outDir: String, nBuckets: Int,
      source: String): Int = {
    val spark = routed.sparkSession
    val done = completedBuckets(outDir)
    val pending = (0 until nBuckets).filterNot(done)
    if (pending.isEmpty) return 0

    val bucketed = withBucket(routed, nBuckets)
      .filter(col(BucketCol).isin(pending: _*))

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    bucketed.write
      .mode(SaveMode.Overwrite)
      .partitionBy(BucketCol, "role", "tool", "event_type")
      .parquet(s"$outDir/routed")

    // Lineage + metrics per bucket, computed from the committed files
    // (read-back doubles as a write validation).
    val stats = routed.sparkSession.read.parquet(s"$outDir/routed")
      .filter(col(BucketCol).isin(pending: _*))
      .groupBy(BucketCol)
      .agg(
        count(lit(1)).as("n_routed"),
        approx_count_distinct(col("conv_id")).as("n_convs_approx"),
        min(col("position")).as("min_pos"),
        max(col("position")).as("max_pos"))
      .collect()
      .map(r => r.getAs[Int](BucketCol) -> r).toMap

    Files.createDirectories(manifestDir(outDir))
    pending.foreach { b =>
      val s = stats.get(b)
      val json =
        s"""{"bucket": $b, "source": "$source",
           | "n_routed": ${s.map(_.getAs[Long]("n_routed")).getOrElse(0L)},
           | "n_convs_approx": ${s.map(_.getAs[Long]("n_convs_approx")).getOrElse(0L)},
           | "min_pos": ${s.map(_.getAs[Long]("min_pos")).getOrElse(-1L)},
           | "max_pos": ${s.map(_.getAs[Long]("max_pos")).getOrElse(-1L)}}""".stripMargin
      Files.writeString(manifestDir(outDir).resolve(s"bucket-$b.json"), json)
    }
    pending.size
  }

  /** Per-sink counts of the committed output (for golden-count checks). */
  def committedSinkCounts(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/routed")
      .groupBy("role", "tool", "event_type")
      .agg(count(lit(1)).as("n"))
}

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
    *
    * Per-bucket lineage stats ride the WRITE pass itself via
    * `Dataset.observe` (buckets are enumerable, so per-bucket grouping
    * becomes conditional aggregates) — zero extra jobs, zero re-read of
    * committed parquet; at 100 TB a read-back would double the run's I/O
    * (VERDICT r01 #5). `validate = true` opts back into the full read-back
    * cross-check of committed files.
    */
  def writeResumable(routed: DataFrame, outDir: String, nBuckets: Int,
      source: String, validate: Boolean = false): Int = {
    val spark = routed.sparkSession
    val done = completedBuckets(outDir)
    val pending = (0 until nBuckets).filterNot(done)
    if (pending.isEmpty) return 0

    val obs = org.apache.spark.sql.Observation()
    val statExprs = pending.flatMap { b =>
      val in = col(BucketCol) === b
      Seq(
        count(when(in, 1)).as(s"n_$b"),
        approx_count_distinct(when(in, col("conv_id"))).as(s"c_$b"),
        min(when(in, col("position"))).as(s"mn_$b"),
        max(when(in, col("position"))).as(s"mx_$b"))
    }
    val bucketed = withBucket(routed, nBuckets)
      .filter(col(BucketCol).isin(pending: _*))
      .observe(obs, statExprs.head, statExprs.tail: _*)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    bucketed.write
      .mode(SaveMode.Overwrite)
      .partitionBy(BucketCol, "role", "tool", "event_type")
      .parquet(s"$outDir/routed")

    val observed = obs.get
    val stats: Map[Int, (Long, Long, Long, Long)] = pending.map { b =>
      def l(k: String, dflt: Long) =
        observed.get(k).collect { case n: Number => n.longValue }.getOrElse(dflt)
      b -> ((l(s"n_$b", 0L), l(s"c_$b", 0L), l(s"mn_$b", -1L), l(s"mx_$b", -1L)))
    }.toMap

    if (validate) {
      val back = spark.read.parquet(s"$outDir/routed")
        .filter(col(BucketCol).isin(pending: _*))
        .groupBy(BucketCol).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getAs[Int](BucketCol) -> r.getAs[Long]("n")).toMap
      pending.foreach { b =>
        val want = stats(b)._1; val got = back.getOrElse(b, 0L)
        require(got == want, s"bucket $b: committed $got rows, observed $want")
      }
    }

    Files.createDirectories(manifestDir(outDir))
    pending.foreach { b =>
      val (n, c, mn, mx) = stats(b)
      val json =
        s"""{"bucket": $b, "source": "$source",
           | "n_routed": $n,
           | "n_convs_approx": $c,
           | "min_pos": $mn,
           | "max_pos": $mx}""".stripMargin
      Files.writeString(manifestDir(outDir).resolve(s"bucket-$b.json"), json)
    }
    pending.size
  }

  /** Newline-delimited canonical-JSON sink — the Spark-native form of the
    * reference's `streamCollector` (`parser/consumer_chain.go:61-81`): every
    * passing message serialized by `marshalMessage` and appended with a
    * trailing newline. `pretty = false` is the CLI default (`main.go:19`);
    * text-file rows are newline-terminated, so pretty mode yields the same
    * blank-line-free concatenation `assertJson` trims
    * (`parse_binlog_file_integration_test.go:83-103`).
    *
    * Distributed: one text-file part per partition, no driver collect. For
    * deterministic file content order, order the input by (conv_id,
    * turn_idx) beforehand (GoldenFixtureSpec does; at scale, per-partition
    * order is what the reference's per-file order corresponds to).
    */
  def writeNdjson(routed: DataFrame, outDir: String, pretty: Boolean = false): Unit =
    graft.functions.CanonicalJson.fromRouted(routed, pretty)
      .write.mode(SaveMode.Overwrite).text(outDir)

  /** Per-sink counts of the committed output (for golden-count checks). */
  def committedSinkCounts(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/routed")
      .groupBy("role", "tool", "event_type")
      .agg(count(lit(1)).as("n"))
}

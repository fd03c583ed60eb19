package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side plumbing is real and tested — schema, partitioning,
  * batched per-partition processing (the Scala analog of `mapInPandas`:
  * mapPartitions over fixed-size batches so a vectorized decoder gets
  * amortized calls), deterministic output schema. The actual codec is a
  * STUB: this container ships no image/audio libraries, so `decodeBytes`
  * derives deterministic fake samples from the payload bytes. Swapping in a
  * real decoder changes ONE function; every schema/batch/partition decision
  * stays.
  */
object Multimodal {

  val BatchSize = 64 // decoder batch shape (mapInPandas batch analog)

  case class Media(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      mean_byte: Double, hist0: Int, hist1: Int, hist2: Int, hist3: Int)

  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Derive a deterministic media table from `documents` (payload = UTF-8
    * bytes of text; kind by doc_id mod 3) — no external data, per the
    * sandbox rule; at production scale this is `spark.read` of real blobs.
    */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(64)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("doc_id"), lit(10)) + 1).cast("int").as("n_frames"))
      .as[Media]
  }

  /** STUB decoder — ??? in spirit: a real build links an image/audio codec
    * here. Deterministic fake: the "decoded samples" are the payload bytes.
    */
  private def decodeBytes(payload: Array[Byte]): Array[Int] =
    payload.map(b => b & 0xff)

  /** Batched decode + feature extraction. Partition-local, batch-shaped:
    * `grouped(BatchSize)` hands the (stub) decoder BatchSize payloads at a
    * time, exactly how a vectorized decoder wants its input.
    */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val samples = decodeBytes(m.payload)
          val n = samples.length
          val mean = if (n == 0) 0.0 else samples.map(_.toLong).sum.toDouble / n
          val hist = new Array[Int](4)
          samples.foreach(s => hist(s / 64) += 1)
          MediaFeatures(m.media_id, m.kind, n, mean, hist(0), hist(1), hist(2), hist(3))
        }
      }
    }
  }

  /** "Resize": deterministic payload downsample to width*height bytes.
    * Real impl would be the codec's resample; plumbing (typed map,
    * schema-preserving) is the point.
    */
  def resize(media: Dataset[Media], w: Int, h: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val target = math.max(1, w * h)
      val step = math.max(1, m.payload.length / target)
      val out = m.payload.indices.by(step).take(target).map(m.payload).toArray
      m.copy(payload = out, width = w, height = h)
    }
  }

  /** Frame sampling for video: payload chunked into n_frames equal slices,
    * every `every`-th slice emitted — a typed flatMap (1 → N explode).
    */
  def sampleFrames(media: Dataset[Media], every: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = math.max(1, m.n_frames)
      val sz = math.max(1, m.payload.length / n)
      (0 until n by every).map { f =>
        Frame(m.media_id, f, m.payload.slice(f * sz, math.min((f + 1) * sz, m.payload.length)))
      }
    }
  }

  /** Fixed-point per-dimension embedding checksums — the ORACLE-CHECKABLE
    * form of [[embed]]. Each (media_id, d) row carries
    * `round(1e6 * Σ_{i ≡ d (mod dim)} samples(i)/255.0)` computed as a
    * sequential left-fold over ascending i in Double: DuckDB's
    * `list_reduce` folds the identical list in the identical order, so the
    * doubles are bit-identical cross-engine and the rounded fixed-point is
    * exactly comparable (see MultimodalPack.oracleSql).
    */
  def embedFixedPoint(media: Dataset[Media], dim: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val s = decodeBytes(m.payload)
      (0 until dim).map { d =>
        var acc = 0.0
        var i = d
        while (i < s.length) { acc += s(i) / 255.0; i += dim }
        (m.media_id, d, math.round(acc * 1e6))
      }
    }.toDF("media_id", "d", "fp")
  }

  /** Deterministic embedding from decoded samples (bridges multimodal data
    * into the ANN/similarity operators).
    */
  def embed(media: Dataset[Media], dim: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.map { m =>
      val s = decodeBytes(m.payload)
      val v = Array.tabulate(dim) { d =>
        if (s.isEmpty) 0f
        else s.indices.filter(_ % dim == d).map(i => s(i).toFloat / 255f).sum
      }
      (m.media_id, v)
    }.toDF("media_id", "embedding")
  }
}

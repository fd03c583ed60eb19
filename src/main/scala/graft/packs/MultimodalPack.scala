package graft.packs

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal queries — rows-only driver checks (no oracle: batched binary
  * decode is not SQL-expressible; the driver records the weaker check).
  */
object MultimodalPack extends QueryPack {

  def queries = Map(
    "mm_features" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.fromDocuments(s, dir)).toDF()),
    "mm_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.fromDocuments(s, dir), every = 2)
        .toDF().select(col("media_id"), col("frame_idx"), length(col("frame")).as("n_bytes"))),
    "mm_embed" -> ((s, dir) =>
      Multimodal.embed(Multimodal.fromDocuments(s, dir))
        .select(col("media_id"), size(col("embedding")).as("dim")))
  )

  def oracleSql = Map.empty[String, String]
}

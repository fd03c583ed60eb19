package graft.packs

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal queries — each with a full DuckDB oracle.
  *
  * The (stub) decoder's "samples" are the payload's bytes, and the payload
  * is the UTF-8 encoding of `documents.text` — so DuckDB can recompute every
  * decoded sample exactly via `hex(text)`: byte i of the payload is
  * `('0x' || substr(hex(text), 2i+1, 2))::INT`. That turns the whole
  * decode → feature/frame/resize/embed math into integer/double arithmetic
  * with identical value semantics in both engines (double folds are
  * sequential and in the same element order, hence bit-identical; see
  * [[Multimodal.embedFixedPoint]]).
  */
object MultimodalPack extends QueryPack {

  def queries = Map(
    "mm_features" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.fromDocuments(s, dir)).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"), col("mean_byte"),
          col("hist0"), col("hist1"), col("hist2"), col("hist3"))),
    "mm_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.fromDocuments(s, dir), every = 2)
        .toDF().select(col("media_id"), col("frame_idx"), length(col("frame")).as("n_bytes"))),
    "mm_resize" -> ((s, dir) =>
      Multimodal.resize(Multimodal.fromDocuments(s, dir), w = 8, h = 6).toDF()
        .select(col("media_id"), length(col("payload")).as("n_bytes"),
          col("width"), col("height"))),
    "mm_embed" -> ((s, dir) =>
      Multimodal.embedFixedPoint(Multimodal.fromDocuments(s, dir))),
    // REAL codec end-to-end (VERDICT r04 #2): deterministic grayscale PNGs
    // encoded AND decoded with javax.imageio in the executors; the oracle
    // recomputes the features straight from the generative pixel formula,
    // so a green row proves the codec round-trip, not byte arithmetic.
    "mm_decode_real" -> ((s, dir) =>
      Multimodal.decodeImageFeatures(
        Multimodal.withPngPayload(Multimodal.fromDocuments(s, dir))).toDF()),
    // REAL audio codec end-to-end: deterministic 16-bit PCM encoded into
    // RIFF/WAVE and decoded back with javax.sound.sampled in the
    // executors; the oracle recomputes the signal features straight from
    // the generative sample formula, so a green row proves the container
    // round-trip (sample count and every positional/aggregate feature).
    "mm_audio_real" -> ((s, dir) =>
      Multimodal.decodeAudioFeatures(
        Multimodal.withWavPayload(Multimodal.fromDocuments(s, dir))).toDF())
  )

  /** Media-table CTE shared by all oracles: mirrors
    * [[Multimodal.fromDocuments]] (payload = UTF-8 bytes of text; kind by
    * doc_id mod 3; n_frames = doc_id mod 10 + 1) plus the decoded byte list.
    */
  private val mediaCte = """media AS (
    SELECT doc_id AS media_id,
      CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      octet_length(encode(text)) AS n_bytes,
      list_transform(range(1, octet_length(encode(text)) + 1),
                     i -> ('0x' || substr(hex(text), 2*i - 1, 2))::INT) AS bytes,
      CAST(doc_id % 10 + 1 AS INT) AS n_frames
    FROM documents)"""

  def oracleSql = Map(
    "mm_features" ->
      s"""WITH $mediaCte
         SELECT media_id, kind, CAST(n_bytes AS INT) AS n_bytes,
           CASE WHEN n_bytes = 0 THEN 0.0
                ELSE CAST(list_sum(bytes) AS DOUBLE) / n_bytes END AS mean_byte,
           CAST(len(list_filter(bytes, b -> b // 64 = 0)) AS INT) AS hist0,
           CAST(len(list_filter(bytes, b -> b // 64 = 1)) AS INT) AS hist1,
           CAST(len(list_filter(bytes, b -> b // 64 = 2)) AS INT) AS hist2,
           CAST(len(list_filter(bytes, b -> b // 64 = 3)) AS INT) AS hist3
         FROM media""",
    "mm_frames" ->
      s"""WITH $mediaCte,
         v AS (SELECT media_id, n_bytes,
                 greatest(1, n_frames) AS nf,
                 greatest(1, n_bytes // greatest(1, n_frames)) AS sz
               FROM media WHERE kind = 'video')
         SELECT media_id, CAST(f AS INT) AS frame_idx,
           CAST(greatest(0, least((f + 1) * sz, n_bytes) - least(f * sz, n_bytes)) AS INT) AS n_bytes
         FROM v, UNNEST(range(0, nf, 2)) AS u(f)""",
    "mm_resize" ->
      s"""WITH $mediaCte,
         p AS (SELECT media_id, n_bytes, greatest(1, n_bytes // 48) AS step FROM media)
         SELECT media_id,
           CAST(least(48, CASE WHEN n_bytes = 0 THEN 0 ELSE (n_bytes - 1) // step + 1 END) AS INT) AS n_bytes,
           8 AS width, 6 AS height
         FROM p""",
    "mm_embed" ->
      s"""WITH $mediaCte,
         dims AS (SELECT media_id, bytes, d FROM media, UNNEST(range(0, 16)) AS u(d)),
         sel AS (SELECT media_id, d,
                   list_transform(list_filter(bytes, (b, i) -> (i - 1) % 16 = d),
                                  b -> b / 255.0) AS terms
                 FROM dims)
         SELECT media_id, CAST(d AS INT) AS d,
           CAST(round(1e6 * CASE WHEN len(terms) = 0 THEN 0.0
                                 ELSE list_reduce(terms, (a, b) -> a + b) END) AS BIGINT) AS fp
         FROM sel""",
    // expected features from the generative formula s(i) =
    // (media_id*37 + i*11) % 65536 - 32768 — mirrors Multimodal.sampleAt;
    // the Spark side must reproduce these THROUGH the WAV encode/decode.
    "mm_audio_real" ->
      """WITH aud AS (SELECT doc_id AS media_id,
             CAST((doc_id % 10 + 1) * 160 AS INT) AS n
           FROM documents WHERE doc_id % 3 = 1),
         smp AS (SELECT media_id, n, i,
                  (media_id * 37 + i * 11) % 65536 - 32768 AS s
                FROM aud, UNNEST(range(0, n)) AS u(i))
         SELECT media_id, CAST(MAX(n) AS INT) AS n_samples,
           CAST(SUM(s) AS BIGINT) AS sum_s,
           CAST(MIN(s) AS INT) AS min_s, CAST(MAX(s) AS INT) AS max_s,
           CAST(MAX(CASE WHEN i = 0 THEN s END) AS INT) AS s0,
           CAST(MAX(CASE WHEN i = n - 1 THEN s END) AS INT) AS s_last,
           CAST(COUNT(*) FILTER (WHERE i > 0 AND
             s * ((media_id * 37 + (i - 1) * 11) % 65536 - 32768) < 0)
             AS INT) AS n_zero_cross
         FROM smp GROUP BY media_id""",

    // expected features from the generative formula pixel(x,y) =
    // (media_id*31 + x*7 + y*13) % 256 — mirrors Multimodal.pixelAt; the
    // Spark side must reproduce these THROUGH the PNG encode/decode.
    "mm_decode_real" ->
      """WITH img AS (SELECT doc_id AS media_id,
             CAST(doc_id % 64 + 1 AS INT) AS w, CAST(doc_id % 48 + 1 AS INT) AS h
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT media_id, w, h, x, y,
                  (media_id * 31 + x * 7 + y * 13) % 256 AS p
                FROM img, UNNEST(range(0, w)) AS ux(x), UNNEST(range(0, h)) AS uy(y))
         SELECT media_id, w AS width, h AS height, CAST(w * h AS INT) AS n_pixels,
           CAST(SUM(p) AS DOUBLE) / (w * h) AS mean_px,
           CAST(COUNT(*) FILTER (WHERE p // 64 = 0) AS INT) AS hist0,
           CAST(COUNT(*) FILTER (WHERE p // 64 = 1) AS INT) AS hist1,
           CAST(COUNT(*) FILTER (WHERE p // 64 = 2) AS INT) AS hist2,
           CAST(COUNT(*) FILTER (WHERE p // 64 = 3) AS INT) AS hist3,
           CAST(MAX(CASE WHEN x = 0 AND y = 0 THEN p END) AS INT) AS px00,
           CAST(MAX(CASE WHEN x = w - 1 AND y = h - 1 THEN p END) AS INT) AS px_last
         FROM px GROUP BY media_id, w, h"""
  )
}

package graft.packs

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Text-analysis queries over `documents` with DuckDB oracles. */
object TextPack extends QueryPack {

  private val duckToks = "regexp_split_to_array(trim(text), '\\s+')"

  private def duckStopCount(lang: String): String = {
    val words = TextAnalysis.stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter($duckToks, t -> t IN ($words))) AS INT)"
  }

  def queries = Map(
    "text_tokens" -> ((s, dir) => TextAnalysis.tokenStats(docs(s, dir))),
    "text_quality" -> ((s, dir) => TextAnalysis.quality(docs(s, dir))),
    "text_langid" -> ((s, dir) => TextAnalysis.langId(docs(s, dir))),
    "text_fingerprint" -> ((s, dir) => TextAnalysis.fingerprint(docs(s, dir))),
    "text_vocab" -> ((s, dir) => TextAnalysis.vocab(docs(s, dir)))
  )

  def oracleSql = Map(
    "text_tokens" ->
      s"""SELECT doc_id,
          CAST(len($duckToks) AS INT) AS n_tokens,
          CAST(len(list_distinct($duckToks)) AS INT) AS n_distinct,
          CAST(length(text) AS BIGINT) AS n_chars_m
          FROM documents""",

    "text_quality" ->
      s"""SELECT doc_id,
          CAST(len($duckToks) AS INT) AS n_tokens,
          ${duckStopCount("en")} AS n_stop,
          CAST(len(list_filter($duckToks, t -> length(t) >= 10)) AS INT) AS n_long_tokens,
          CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS INT) AS n_punct,
          CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS INT) AS n_upper
          FROM documents""",

    "text_langid" ->
      s"""SELECT doc_id,
          ${duckStopCount("en")} AS n_en, ${duckStopCount("de")} AS n_de,
          ${duckStopCount("fr")} AS n_fr, ${duckStopCount("es")} AS n_es,
          CASE WHEN ${duckStopCount("en")} >= greatest(${duckStopCount("de")}, ${duckStopCount("fr")}, ${duckStopCount("es")}) THEN 'en'
               WHEN ${duckStopCount("de")} >= greatest(${duckStopCount("fr")}, ${duckStopCount("es")}) THEN 'de'
               WHEN ${duckStopCount("fr")} >= ${duckStopCount("es")} THEN 'fr'
               ELSE 'es' END AS lang_pred
          FROM documents""",

    "text_fingerprint" ->
      s"""SELECT doc_id,
          md5(array_to_string(list_sort(list_distinct($duckToks)), ' ')) AS fp
          FROM documents""",

    "text_vocab" ->
      s"""SELECT token, n, CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS INT) AS rank
          FROM (
            SELECT token, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest($duckToks) AS token FROM documents)
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 50)"""
  )
}

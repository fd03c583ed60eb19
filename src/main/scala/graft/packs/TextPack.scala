package graft.packs

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Text-analysis queries over `documents` with DuckDB oracles. */
object TextPack extends QueryPack {

  private val duckToks = "regexp_split_to_array(trim(text), '\\s+')"

  // per-doc TF-IDF top-k width (shared by query and oracle)
  val TfidfK = 5

  private def duckStopCount(lang: String): String = {
    val words = TextAnalysis.stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter($duckToks, t -> t IN ($words))) AS INT)"
  }

  def queries = Map(
    "text_tokens" -> ((s, dir) => TextAnalysis.tokenStats(docs(s, dir))),
    "text_quality" -> ((s, dir) => TextAnalysis.quality(docs(s, dir))),
    "text_langid" -> ((s, dir) => TextAnalysis.langId(docs(s, dir))),
    "text_fingerprint" -> ((s, dir) => TextAnalysis.fingerprint(docs(s, dir))),
    "text_vocab" -> ((s, dir) => TextAnalysis.vocab(docs(s, dir))),
    // per-doc top-k TF-IDF terms under the log-free rational IDF (the
    // engine-exact ordering; see TextAnalysis.tfidf)
    "text_tfidf" -> ((s, dir) => TextAnalysis.tfidf(docs(s, dir), TfidfK)),
    // PII redaction over a deterministically PII-injected view of the
    // corpus (the synthetic documents contain no natural PII; the fixture
    // injection is mirrored verbatim in the oracle — the operator under
    // test is the scrubber, not the injector)
    "text_pii_scrub" -> ((s, dir) =>
      TextAnalysis.piiScrub(docs(s, dir).withColumn("text", piiInjected)))
  )

  /** Deterministic PII fixture: emails on doc_id % 5, IPv4 on % 7, phone
    * numbers on % 11 — every combination (incl. none and all three)
    * occurs, all derived from doc_id alone.
    */
  private def piiInjected: org.apache.spark.sql.Column =
    concat(col("text"),
      when(col("doc_id") % 5 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" from 10."), (col("doc_id") % 200).cast("string"),
          lit(".0."), (col("doc_id") % 250).cast("string"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" call +1-555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
          lit("-0199"))).otherwise(lit("")))

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
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 50)""",

    "text_tfidf" ->
      s"""WITH tf AS (
            SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest($duckToks) AS token FROM documents)
            GROUP BY doc_id, token),
          dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
            FROM tf GROUP BY token),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          scored AS (
            SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
              CAST(tf.tf * n.n_docs AS DOUBLE) / dfq.df AS score
            FROM tf JOIN dfq USING (token) CROSS JOIN n)
          SELECT doc_id, token, tf, df,
            CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, token ASC) AS INT) AS rank
          FROM scored
          QUALIFY rank <= $TfidfK""",

    "text_pii_scrub" -> {
      // same regex source strings as the Spark side (both dialects read
      // them identically; DuckDB needs the explicit 'g' flag Spark implies)
      val (em, ip, ph) =
        (TextAnalysis.EmailRe, TextAnalysis.Ipv4Re, TextAnalysis.PhoneRe)
      s"""WITH piidocs AS (SELECT doc_id,
            text
            || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
            || CASE WHEN doc_id % 7 = 0 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END
            || CASE WHEN doc_id % 11 = 0 THEN ' call +1-555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199' ELSE '' END
            AS text FROM documents)
          SELECT doc_id,
            CAST(len(regexp_extract_all(text, '$em')) AS INT) AS n_emails,
            CAST(len(regexp_extract_all(text, '$ip')) AS INT) AS n_ipv4,
            CAST(len(regexp_extract_all(text, '$ph')) AS INT) AS n_phones,
            regexp_replace(regexp_replace(regexp_replace(text,
              '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$ph', '<PHONE>', 'g')
              AS clean_text
          FROM piidocs"""
    }
  )
}

package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** PII-scrub semantics beyond the DuckDB oracle: exact redaction output on
  * handwritten fixtures (the oracle proves engine parity; this pins what
  * the scrubber is SUPPOSED to emit, so a regex edit can't silently change
  * both sides in lockstep).
  */
class TextSpec extends SparkSpec {

  private def scrub(texts: (Long, String)*) = {
    val s = spark
    import s.implicits._
    TextAnalysis.piiScrub(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3)), r.getString(4))).toMap
  }

  test("piiScrub redacts emails, IPv4s and phones with exact counts") {
    val out = scrub(
      1L -> "write to bob.smith+x@sub.example.org today",
      2L -> "hosts 10.0.0.1 and 192.168.255.3 are up",
      3L -> "call +1-555-123-4567 or +44-201-555-0199",
      4L -> "mixed a@b.co at 8.8.8.8 dial +1-555-000-1111",
      5L -> "no pii here, just words and 12.5 percent")
    assert(out(1L) == ((1, 0, 0), "write to <EMAIL> today"))
    assert(out(2L) == ((0, 2, 0), "hosts <IP> and <IP> are up"))
    assert(out(3L) == ((0, 0, 2), "call <PHONE> or <PHONE>"))
    assert(out(4L) == ((1, 1, 1), "mixed <EMAIL> at <IP> dial <PHONE>"))
    assert(out(5L) == ((0, 0, 0), "no pii here, just words and 12.5 percent"))
  }

  test("piiScrub placeholders are fixed points (no double redaction)") {
    val once = scrub(1L -> "a@b.co 1.2.3.4 +1-555-123-4567")(1L)._2
    assert(once == "<EMAIL> <IP> <PHONE>")
    assert(scrub(1L -> once)(1L) == ((0, 0, 0), once))
  }

  test("tfidf: rare terms outrank common ones; k bounds ranks; df counts docs") {
    val s = spark
    import s.implicits._
    // "shared" is in every doc (df=3, idf=1 → lowest weight); each doc
    // also has a unique term (df=1) and doc 1 repeats its unique term
    val docs = Seq(
      1L -> "alpha alpha shared shared shared",
      2L -> "beta shared",
      3L -> "gamma shared").toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    // doc 1: alpha tf=2 df=1 → score 6.0 beats shared tf=3 df=3 → 3.0
    assert(out((1L, "alpha")) == ((2L, 1L, 1)))
    assert(out((1L, "shared")) == ((3L, 3L, 2)))
    // docs 2/3: the unique term (tf=1, df=1, score 3.0) outranks shared
    // (tf=1, df=3, score 1.0)
    assert(out((2L, "beta")) == ((1L, 1L, 1)))
    assert(out((3L, "gamma")) == ((1L, 1L, 1)))
    assert(out.keys.groupBy(_._1).values.forall(_.size <= 2), "k=2 bound")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parse stage — the vectorized analog of the reference's event decoder +
  * dispatcher (`parser/parser/binlog_to_messages.go:19-100`).
  *
  * Pure column expressions (all codegen'd built-ins: regexp_extract, split,
  * transform, upper/trim/startswith) so the whole stage stays inside one
  * WholeStageCodegen span and costs one pass over `text`. The original
  * `text` column is passed through untouched (north-rule byte-identity
  * invariant).
  *
  * Output columns added:
  *  - kind:        'insert'|'update'|'delete'|'query'|'commit'|'' (noise)
  *  - stmt:        raw SQL after `stmt=` (query lines only, else '')
  *  - suppressed:  BEGIN / SAVEPOINT classification
  *                 (`binlog_to_messages.go:21-39`)
  *  - xid:         commit id (commit lines only, else null)
  *  - vals:        array<array<string>> — physical rows, each a positional
  *                 value list (the RowsEvent.Rows analog)
  *  - rows_declared: the `rows=N` header field (cross-check for vals size)
  */
object Parse {

  private val kindRe = "^EVENT (insert|update|delete|query|commit)\\b"
  private val stmtRe = "stmt=(.*)$"
  private val xidRe = "xid=(\\d+)"
  private val rowsRe = "rows=(\\d+)"
  private val valsRe = "vals=(.*)$"

  /** BEGIN swallowed; `SAVEPOINT …` prefix swallowed — exact classification
    * from `binlog_to_messages.go:25-28` (ToUpper ∘ Trim, HasPrefix).
    */
  def isSuppressed(stmt: Column): Column = {
    val norm = upper(trim(stmt))
    (norm === "BEGIN") || norm.startsWith("SAVEPOINT")
  }

  def parse(turns: DataFrame): DataFrame = {
    val kind = regexp_extract(col("text"), kindRe, 1)
    val stmt = regexp_extract(col("text"), stmtRe, 1)
    val valsStr = regexp_extract(col("text"), valsRe, 1)
    // "[a|b];[c|d]" -> [["a","b"],["c","d"]]
    val vals = transform(
      split(valsStr, ";"),
      grp => split(regexp_replace(grp, "^\\[|\\]$", ""), "\\|"))
    turns
      .withColumn("kind", kind)
      .withColumn("stmt", stmt)
      .withColumn("suppressed", col("kind") === "query" && isSuppressed(col("stmt")))
      .withColumn("xid",
        when(col("kind") === "commit",
          regexp_extract(col("text"), xidRe, 1).cast("long")))
      .withColumn("rows_declared",
        when(col("kind").isin("insert", "update", "delete"),
          regexp_extract(col("text"), rowsRe, 1).cast("int")))
      .withColumn("vals",
        when(col("kind").isin("insert", "update", "delete"), vals))
  }

  /** RFC3339 UTC event time — `messages/message.go:24-32`
    * (`time.Unix(ts,0).UTC().Format(time.RFC3339)`). Requires
    * spark.sql.session.timeZone=UTC.
    */
  def eventTime(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
}

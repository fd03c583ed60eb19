package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transcript input sources.
  *
  * Two producers of the input-hint table
  * (conv_id, turn_idx, role, text, tool, ts):
  *
  *  1. [[Transcripts.fromEvents]] — a deterministic derivation from the
  *     driver-provided `events.parquet`, expressed with ONLY functions whose
  *     value semantics are identical in Spark SQL and DuckDB. The same
  *     derivation is exported as a DuckDB CTE ([[Transcripts.turnsCte]]) so
  *     every pipeline operator gets a DuckDB oracle over the same rows.
  *  2. [[Transcripts.synthetic]] — a `spark.range`-based generator for
  *     benchmark scale (millions of turns, no input files, fully
  *     distributed, optional hot-conversation skew).
  *
  * The `text` column carries the parseable event grammar (FIXTURES.md §2),
  * which stands in for the binlog row-event bytes that the reference decodes
  * (`parser/parser/binlog_to_messages.go:19-100`).
  */
object Transcripts {

  /** One SQL template, two dialects. `$div` is integer division
    * (Spark `div`, DuckDB `//`); everything else — `%`, `||`, CASE, CAST,
    * row_number — has identical value semantics in both engines.
    */
  private def selectBody(div: String): String = s"""
    'c' || CAST(user_id AS STRING) || '_' || CAST(event_id $div 40 AS STRING) AS conv_id,
    CAST(row_number() OVER (PARTITION BY user_id, event_id $div 40 ORDER BY event_id) AS INT) AS turn_idx,
    CASE (event_id $div 10) % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' WHEN 2 THEN 'system' ELSE 'tool' END AS role,
    CASE event_id % 10
      WHEN 0 THEN 'EVENT insert rows=1 vals=[' || CAST(event_id AS STRING) || '|' || event_type || '|v' || CAST(event_id % 100 AS STRING) || ']'
      WHEN 1 THEN 'EVENT insert rows=1 vals=[' || CAST(event_id AS STRING) || '|' || event_type || '|v' || CAST(event_id % 100 AS STRING) || ']'
      WHEN 2 THEN 'EVENT insert rows=2 vals=[' || CAST(event_id AS STRING) || '|' || event_type || '|x];[' || CAST(event_id AS STRING) || '|' || event_type || '|y]'
      WHEN 3 THEN 'EVENT delete rows=1 vals=[' || CAST(event_id AS STRING) || '|' || event_type || '|gone]'
      WHEN 4 THEN 'EVENT update rows=2 vals=[' || CAST(event_id AS STRING) || '|' || event_type || '|old];[' || CAST(event_id AS STRING) || '|' || event_type || '|new]'
      WHEN 5 THEN 'EVENT query stmt=CREATE TABLE t' || CAST(event_id % 7 AS STRING) || ' (id INT)'
      WHEN 6 THEN 'EVENT query stmt=BEGIN'
      WHEN 7 THEN 'EVENT query stmt= SAVEPOINT sp' || CAST(event_id % 3 AS STRING)
      WHEN 8 THEN 'EVENT commit xid=' || CAST(event_id AS STRING)
      ELSE 'note ' || props
    END AS text,
    CASE (event_id $div 7) % 5 WHEN 0 THEN 'search' WHEN 1 THEN 'calc' WHEN 2 THEN 'db' WHEN 3 THEN 'web' ELSE '' END AS tool,
    ts"""

  /** DuckDB CTE prelude for every oracle SQL: `WITH turns AS (...) SELECT …`.
    * The driver points DuckDB at the same parquet dir, table name `events`.
    */
  val turnsCte: String =
    s"WITH turns AS (SELECT ${selectBody("//")} FROM events)"

  /** turnsCte plus the lookup CTE, for enrichment oracles. */
  lazy val turnsAndLookupCte: String = s"$turnsCte, $lookupCte"

  /** True iff `path` exists on whatever filesystem its scheme names —
    * probed through Hadoop's FileSystem API, so hdfs:// / s3a:// inputs
    * work exactly like local paths (ADVICE r02: the java.io.File probe
    * rejected every non-local path the cluster use-case needs even though
    * spark.read could read it). Scheme-less paths resolve against
    * fs.defaultFS (file:/// locally, the cluster FS on a real deployment).
    */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Fail-fast input validation — the `ParseBinlog` stat-before-parse
    * analog (`parser/binlog_parser.go:9-15`): surface a clear error BEFORE
    * building the DAG instead of a deep AnalysisException from the reader.
    */
  def requireReadable(spark: SparkSession, path: String): Unit =
    require(pathExists(spark, path),
      s"input not found: $path (binlog_parser.go:9-15 analog)")

  /** The same rows, computed by Spark from `$sfDir/events.parquet`. */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    requireReadable(spark, s"$sfDir/events.parquet")
    spark.read.parquet(s"$sfDir/events.parquet")
      .createOrReplaceTempView("graft_events_src")
    spark.sql(s"SELECT ${selectBody("div")} FROM graft_events_src")
  }

  /** Turns from newline-delimited JSON — the ingest format most log
    * pipelines actually ship (and the reference's own OUTPUT format, so a
    * graft stage can consume another's stream). Schema is EXPLICIT: at
    * 100 TB a schema-inference pass would read the corpus twice, and a
    * drifting field must fail loudly, not silently re-type a column.
    * `ts` accepts epoch seconds or ISO-8601.
    */
  def fromNdjson(spark: SparkSession, path: String): DataFrame = {
    requireReadable(spark, path)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("conv_id", StringType, nullable = false),
      StructField("turn_idx", IntegerType, nullable = false),
      StructField("role", StringType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("tool", StringType, nullable = false),
      StructField("ts", StringType, nullable = false)))
    // try_* variants: ANSI mode (Spark 4 default) makes plain casts THROW
    // on the non-matching branch instead of yielding null
    spark.read.schema(schema).json(path)
      .withColumn("ts",
        coalesce(
          timestamp_seconds(expr("try_cast(ts AS BIGINT)")),
          expr("try_to_timestamp(ts)")))
  }

  /** Lookup (enrichment) table — the TableMap analog
    * (`database/table_map.go:8-60`). Field specs mirror the reference's
    * seeded test schema (`data/fixtures/test_db.sql`): buildings, rooms,
    * departments, language. 8 of the 20 (role,tool) combos resolve; the
    * rest exercise the drop-with-count path (`binlog_to_messages.go:84-87`).
    */
  val lookupRows: Seq[(String, String, Seq[String])] = Seq(
    ("user", "search", Seq("building_no", "building_name", "address")),
    ("user", "db", Seq("dept_no", "dept_name")),
    ("assistant", "calc", Seq("room_no", "room_name", "building_no")),
    ("assistant", "search", Seq("building_no", "building_name", "address")),
    ("assistant", "web", Seq("language_id", "name", "last_update", "some_field")),
    ("system", "db", Seq("dept_no", "dept_name")),
    ("tool", "web", Seq("language_id", "name", "last_update", "some_field")),
    ("tool", "calc", Seq("room_no", "room_name", "building_no"))
  )

  def lookup(spark: SparkSession): DataFrame = {
    import spark.implicits._
    lookupRows.toDF("role", "tool", "field_names")
  }

  /** The same lookup as a DuckDB CTE fragment:
    * `lookup(role, tool, field_names)`.
    */
  lazy val lookupCte: String = {
    val rows = lookupRows.map { case (r, t, fs) =>
      s"('$r', '$t', [${fs.map(f => s"'$f'").mkString(", ")}])"
    }.mkString(", ")
    s"lookup AS (SELECT * FROM (VALUES $rows) AS v(role, tool, field_names))"
  }

  /** Distributed synthetic generator for benchmark scale. Same grammar,
    * driven by `spark.range` (no input files, no driver-side loop).
    * Deterministic given (nTurns, nConvs, skewPct). `skewPct` percent of
    * all turns are rerouted into one hot conversation ("c0") to exercise
    * the salted-repartition path; turn_idx stays globally unique so
    * within-conversation ordering remains total.
    */
  def synthetic(spark: SparkSession, nTurns: Long, nConvs: Int,
      skewPct: Int = 0): DataFrame = {
    val id = col("id")
    val isHot = if (skewPct > 0) pmod(id, lit(100)) < skewPct else lit(false)
    val convNum = pmod(id, lit(nConvs)).cast("int")
    val etype = element_at(
      array(lit("signup"), lit("click"), lit("error"), lit("view"), lit("purchase")),
      (pmod(id, lit(5)) + 1).cast("int"))
    // turn_idx is DENSE per conversation (real transcripts number turns
    // 0,1,2,… within a conversation — the input_hint semantics, and what
    // block-salting keys on): normal convs use id div nConvs; the one hot
    // conversation uses the raw id (2% of ids → still dense enough that a
    // salt block holds ~blockSize/50 turns).
    spark.range(nTurns).toDF("id")
      .withColumn("conv_id",
        when(isHot, lit("chot")).otherwise(concat(lit("c"), convNum.cast("string"))))
      .withColumn("turn_idx",
        when(isHot, id).otherwise(expr("id DIV " + nConvs)).cast("int"))
      .withColumn("role",
        element_at(array(lit("user"), lit("assistant"), lit("system"), lit("tool")),
          (pmod(expr("id DIV 10"), lit(4)) + 1).cast("int")))
      .withColumn("text", syntheticText(id, etype))
      .withColumn("tool",
        element_at(array(lit("search"), lit("calc"), lit("db"), lit("web"), lit("")),
          (pmod(expr("id DIV 7"), lit(5)) + 1).cast("int")))
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + pmod(id, lit(86400))))
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  /** Grammar text from a numeric id — mirrors selectBody's CASE. */
  private def syntheticText(id: Column, etype: Column): Column = {
    val ids = id.cast("string")
    val k = pmod(id, lit(10))
    when(k <= 1, concat(lit("EVENT insert rows=1 vals=["), ids, lit("|"), etype,
        lit("|v"), pmod(id, lit(100)).cast("string"), lit("]")))
      .when(k === 2, concat(lit("EVENT insert rows=2 vals=["), ids, lit("|"), etype,
        lit("|x];["), ids, lit("|"), etype, lit("|y]")))
      .when(k === 3, concat(lit("EVENT delete rows=1 vals=["), ids, lit("|"), etype, lit("|gone]")))
      .when(k === 4, concat(lit("EVENT update rows=2 vals=["), ids, lit("|"), etype,
        lit("|old];["), ids, lit("|"), etype, lit("|new]")))
      .when(k === 5, concat(lit("EVENT query stmt=CREATE TABLE t"), pmod(id, lit(7)).cast("string"), lit(" (id INT)")))
      .when(k === 6, lit("EVENT query stmt=BEGIN"))
      .when(k === 7, concat(lit("EVENT query stmt= SAVEPOINT sp"), pmod(id, lit(3)).cast("string")))
      .when(k === 8, concat(lit("EVENT commit xid="), ids))
      .otherwise(concat(lit("note {\"k\": "), pmod(id, lit(100)).cast("string"), lit("}")))
  }
}

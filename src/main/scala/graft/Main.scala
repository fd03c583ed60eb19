package graft

import graft.checkpoint.Sinks
import graft.sources.Transcripts
import org.apache.spark.sql.SparkSession

/** spark-submit front-end — the analog of the reference CLI
  * (`main.go:13-69`): flag parsing, include-filter assembly, pretty-print
  * toggle, then one pipeline run. Usage:
  *
  * {{{
  * spark-submit --class graft.Main <jar> \
  *   --input <dir with events.parquet | turns parquet path> \
  *   --output <dir> \
  *   [--include-roles user,assistant]   # -include_schemas analog
  *   [--include-tools search,db]        # -include_tables analog
  *   [--pretty]                         # -prettyprint (default compact)
  *   [--format ndjson|parquet]          # default ndjson (CLI parity)
  *   [--buckets N]                      # parquet resumable fan-out buckets
  *   [--salt-block N]                   # hot-conversation salt block size
  * }}}
  */
object Main {

  case class CliConfig(
      input: String = "",
      output: String = "",
      includeRoles: Seq[String] = Nil,
      includeTools: Seq[String] = Nil,
      pretty: Boolean = false, // json.Marshal is the reference default
      format: String = "ndjson",
      nBuckets: Int = 16,
      saltBlock: Int = 16384)

  /** Comma-list with trim + skip-empty — exact semantics of
    * `commaSeparatedListToArray` (`main.go:89-101`): "a, b,,c" → [a, b, c].
    */
  def commaList(s: String): Seq[String] =
    s.split(",", -1).iterator.map(_.trim).filter(_.nonEmpty).toSeq

  def parseArgs(args: Seq[String]): CliConfig = {
    def loop(rest: List[String], cfg: CliConfig): CliConfig = rest match {
      case Nil => cfg
      case "--input" :: v :: t => loop(t, cfg.copy(input = v))
      case "--output" :: v :: t => loop(t, cfg.copy(output = v))
      case "--include-roles" :: v :: t => loop(t, cfg.copy(includeRoles = commaList(v)))
      case "--include-tools" :: v :: t => loop(t, cfg.copy(includeTools = commaList(v)))
      case "--pretty" :: t => loop(t, cfg.copy(pretty = true))
      case "--format" :: v :: t =>
        require(v == "ndjson" || v == "parquet", s"unknown --format $v")
        loop(t, cfg.copy(format = v))
      case "--buckets" :: v :: t => loop(t, cfg.copy(nBuckets = v.toInt))
      case "--salt-block" :: v :: t => loop(t, cfg.copy(saltBlock = v.toInt))
      case other :: _ => throw new IllegalArgumentException(s"unknown arg: $other")
    }
    val cfg = loop(args.toList, CliConfig())
    require(cfg.input.nonEmpty, "--input is required")
    require(cfg.output.nonEmpty, "--output is required")
    cfg
  }

  def main(args: Array[String]): Unit = {
    val cfg = parseArgs(args.toIndexedSeq)
    val spark = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // input: a testdata-style dir (events.parquet inside) or a turns table.
    // Probed via Hadoop's FileSystem so hdfs:// / s3a:// inputs work —
    // java.io.File rejected every non-local path (ADVICE r02).
    val turns =
      if (Transcripts.pathExists(spark, s"${cfg.input}/events.parquet"))
        Transcripts.fromEvents(spark, cfg.input)
      else {
        Transcripts.requireReadable(spark, cfg.input)
        spark.read.parquet(cfg.input)
      }
    val routed = Pipeline.routed(turns, Transcripts.lookup(spark),
      PipelineConfig(
        includeRoles = cfg.includeRoles,
        includeTools = cfg.includeTools,
        saltBlockSize = Some(cfg.saltBlock)))
    cfg.format match {
      case "ndjson" => Sinks.writeNdjson(routed, cfg.output, cfg.pretty)
      case "parquet" =>
        Sinks.writeResumable(routed, cfg.output, cfg.nBuckets, cfg.input)
    }
    spark.stop()
  }
}

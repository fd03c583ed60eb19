package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI front-end parsing (D1/D2) — mirrors `main_test.go` semantics for
  * `commaSeparatedListToArray` (`main.go:89-101`) plus flag assembly.
  */
class MainSpec extends AnyFunSuite {

  test("comma list: trim + skip-empty (main.go:89-101)") {
    assert(Main.commaList("a, b,,c") == Seq("a", "b", "c"))
    assert(Main.commaList("") == Nil)
    assert(Main.commaList(" , ,") == Nil)
    assert(Main.commaList("one") == Seq("one"))
  }

  test("arg parsing assembles the pipeline config like consumerChainFromArgs (main.go:29-56)") {
    val cfg = Main.parseArgs(Seq(
      "--input", "/in", "--output", "/out",
      "--include-roles", "user, assistant,",
      "--include-tools", "search",
      "--pretty", "--format", "parquet", "--buckets", "8"))
    assert(cfg.input == "/in" && cfg.output == "/out")
    assert(cfg.includeRoles == Seq("user", "assistant"))
    assert(cfg.includeTools == Seq("search"))
    assert(cfg.pretty && cfg.format == "parquet" && cfg.nBuckets == 8)
  }

  test("compact (json.Marshal) is the default, like the reference CLI (main.go:19)") {
    val cfg = Main.parseArgs(Seq("--input", "/in", "--output", "/out"))
    assert(!cfg.pretty && cfg.format == "ndjson")
  }

  test("missing required args / unknown flags fail fast") {
    intercept[IllegalArgumentException](Main.parseArgs(Seq("--output", "/out")))
    intercept[IllegalArgumentException](Main.parseArgs(Seq("--input", "/in")))
    intercept[IllegalArgumentException](
      Main.parseArgs(Seq("--input", "a", "--output", "b", "--bogus")))
  }
}

/** Input probing goes through Hadoop's FileSystem, not java.io.File, so
  * scheme'd paths (file:, hdfs:, s3a:) behave like spark.read (ADVICE r02).
  */
class InputProbeSpec extends SparkSpec {
  import graft.sources.Transcripts

  test("pathExists resolves scheme'd and scheme-less paths alike") {
    assert(Transcripts.pathExists(spark, "/root/testdata/sf0.001/events.parquet"))
    assert(Transcripts.pathExists(spark, "file:///root/testdata/sf0.001/events.parquet"))
    assert(!Transcripts.pathExists(spark, "/root/testdata/no-such-file.parquet"))
    assert(!Transcripts.pathExists(spark, "file:///root/testdata/no-such-file.parquet"))
  }

  test("requireReadable fails fast with the stat-before-parse message") {
    val e = intercept[IllegalArgumentException](
      Transcripts.requireReadable(spark, "/root/testdata/nope"))
    assert(e.getMessage.contains("input not found"))
  }
}

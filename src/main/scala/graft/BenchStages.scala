package graft

import graft.operators._
import graft.sources.Transcripts
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profiler: where does a pipeline second go?
  * Prints one JSON line of per-stage seconds over the same synthetic input.
  */
object BenchStages {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "4000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def turns = Transcripts.synthetic(spark, n, 50000, skewPct = 2)
    val lookup = Transcripts.lookup(spark)

    def consumeAll(df: DataFrame): Unit = {
      val sums = df.schema.fields.collect {
        case f if f.dataType.typeName == "string" => sum(length(col(f.name)))
        case f if f.dataType.typeName == "long" || f.dataType.typeName == "integer" =>
          sum(col(f.name).cast("long"))
      }
      df.agg(count(lit(1)), sums.toSeq: _*).collect()
    }

    def time(name: String, mk: => DataFrame): (String, Double) = {
      // drop references to prior jobs' shuffles so the ContextCleaner can
      // delete their files before we measure (tmpfs pressure otherwise
      // contaminates later stages)
      System.gc()
      Thread.sleep(2000)
      consumeAll(mk) // warmup (codegen)
      System.gc()
      Thread.sleep(1000)
      val t0 = System.nanoTime()
      consumeAll(mk)
      name -> (System.nanoTime() - t0) / 1e9
    }

    val only = sys.env.get("SPARK_GRAFT_STAGE")
    def want(n: String) = only.forall(_ == n)

    val defs = Seq[(String, () => DataFrame)](
      ("gen", () => turns),
      ("parse", () => Parse.parse(turns).drop("vals")),
      ("parse_vals", () => Parse.parse(turns)
        .select(col("conv_id"), size(col("vals")).as("nv"),
          element_at(element_at(col("vals"), 1), 1).as("v00"))),
      ("stamp", () => TxnStamp.stamp(Parse.parse(turns))
        .select(col("conv_id"), col("txn_id"))),
      ("stamp_salted", () => TxnStamp.stampSalted(Parse.parse(turns), 65536)
        .select(col("conv_id"), col("txn_id"))),
      ("enrich", () => Pipeline.enriched(turns, lookup,
        PipelineConfig(saltBlockSize = Some(65536)))
        .select(col("conv_id"), col("matched").cast("long").as("m"), col("txn_id"))),
      ("routed_full", () => Pipeline.routed(turns, lookup,
        PipelineConfig(saltBlockSize = Some(65536)))
        .select(col("conv_id"), col("row_repr"), col("text"), col("txn_id")))
    )
    val stages = defs.collect { case (n, mk) if want(n) => time(n, mk()) }
    val js = stages.map { case (k, v) => s""""$k":${math.rint(v * 100) / 100}""" }
      .mkString("{", ",", "}")
    println(s"""{"bench":"stages","turns":$n,"cpus":$cpus,"sec":$js}""")
    spark.stop()
  }
}

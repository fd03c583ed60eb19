package graft.tools

import graft.{Pipeline, PipelineConfig}
import graft.sources.Transcripts
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B: fused RouteMsgs vs legacy CASE/transform message tree,
  * timed over the identical enriched input (explode + length-sum sink).
  */
object RouteAB {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "2").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.MapRows.register(spark)

    def enriched = Pipeline.enriched(
      Transcripts.synthetic(spark, n, 50000, skewPct = 2),
      Transcripts.lookup(spark), PipelineConfig(saltBlockSize = Some(16384)))

    val entriesType = "array<struct<k:string,v:string>>"
    val nullStr = lit(null).cast("string")
    val nullEntries = lit(null).cast(entriesType)
    def msgStruct(et: Column, rr: Column, or: Column, nr: Column, no: Column,
        nn: Column, q: Column, re: Column, oe: Column, ne: Column): Column =
      struct(et.as("event_type"), rr.as("row_repr"), or.as("old_repr"),
        nr.as("new_repr"), no.as("mapping_notice"), nn.as("new_mapping_notice"),
        q.as("query"), re.as("row_entries"), oe.as("old_entries"),
        ne.as("new_entries"))
    val names = col("field_names"); val vals = col("vals")
    val committed = col("matched") && col("txn_id").isNotNull
    val queryKept = (col("kind") === "query") && !col("suppressed")
    val insertDelete = col("kind").isin("insert", "delete") && committed
    val updateOk = (col("kind") === "update") && committed &&
      (size(vals) >= 2) && (size(vals) % 2 === 0)
    val mapped = graft.functions.MapRows(names, vals)
    val legacy = when(queryKept, array(msgStruct(lit("Query"), nullStr,
        nullStr, nullStr, lit(""), nullStr, col("stmt"), nullEntries, nullEntries, nullEntries)))
      .when(insertDelete, transform(mapped, m => msgStruct(
        when(col("kind") === "insert", "Insert").otherwise("Delete"),
        m.getField("repr"), nullStr, nullStr, m.getField("notice"), nullStr,
        nullStr, m.getField("entries"), nullEntries, nullEntries)))
      .when(updateOk, transform(
        sequence(lit(0), (size(vals) / 2).cast("int") - 1),
        i => msgStruct(lit("Update"), nullStr,
          element_at(mapped, i * 2 + 1).getField("repr"),
          element_at(mapped, i * 2 + 2).getField("repr"),
          element_at(mapped, i * 2 + 1).getField("notice"),
          element_at(mapped, i * 2 + 2).getField("notice"),
          nullStr, nullEntries,
          element_at(mapped, i * 2 + 1).getField("entries"),
          element_at(mapped, i * 2 + 2).getField("entries"))))
      .otherwise(array().cast(s"array<struct<event_type:string,row_repr:string,old_repr:string,new_repr:string,mapping_notice:string,new_mapping_notice:string,query:string,row_entries:$entriesType,old_entries:$entriesType,new_entries:$entriesType>>"))
    val fused = graft.functions.RouteMsgs(col("kind"), col("suppressed"),
      col("stmt"), names, vals, committed, withEntries = true)
    val fusedNoEntries = graft.functions.RouteMsgs(col("kind"), col("suppressed"),
      col("stmt"), names, vals, committed, withEntries = false)

    def sink(df: DataFrame, msgsCol: Column): Unit = {
      df.select(col("text"), col("txn_id"), explode(msgsCol).as("m"))
        .select(sum(length(col("m.row_repr"))), sum(length(col("m.old_repr"))),
          sum(length(col("text"))), sum(col("txn_id"))).collect()
    }
    def time(label: String, msgsCol: => Column): Unit = {
      sink(enriched, msgsCol) // warmup
      val t0 = System.nanoTime(); sink(enriched, msgsCol)
      println(f"ROUTE_AB $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("fused", fused)
    time("noentries", fusedNoEntries)
    time("legacy", legacy)
    time("fused2", fused)
    time("noentries2", fusedNoEntries)
    time("legacy2", legacy)
    spark.stop()
  }
}

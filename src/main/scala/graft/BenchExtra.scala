package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmark main (NOT part of the driver contract — `graft.Bench` is
  * frozen and stays the graded artifact). Two jobs:
  *
  *  1. Per-query isolation with a MATERIALIZING sink (guide §1.4): the
  *     frozen bench times `fn(...).count()`, which lets Catalyst prune
  *     columns and undersells projection-only queries; this main times the
  *     same queries against `write.format("noop")` so every column of every
  *     row is computed. Cited in OPTIMIZATION_r06.md, never graded.
  *  2. Per-PASS wall accounting: the frozen bench reports only the
  *     per-query min over two passes; the ROUND's wall budget pays for both
  *     passes, so pass-1 (cold codegen/planning) times are what wall-time
  *     optimization must target. This main prints pass1/pass2 separately.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench);
  * SPARK_GRAFT_EXTRA_ACTION = count|noop (default noop);
  * SPARK_GRAFT_EXTRA_ONLY = comma-list of query names (default all).
  * Output: one JSON line per pass with per-query seconds + pass wall.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val action = sys.env.getOrElse("SPARK_GRAFT_EXTRA_ACTION", "noop")
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_EXTRA_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same untimed warmup as the frozen bench
    try graft.operators.Agg.sinkCounts(
      Pipeline.routedFromEvents(spark, sfDir)).count()
    catch { case _: Throwable => () }

    def r2(x: Double) = math.rint(x * 100) / 100
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    def pass(label: String): Unit = {
      val w0 = System.nanoTime()
      val rows = names.map { name =>
        spark.sparkContext.setJobDescription(s"$label:$name")
        val t0 = System.nanoTime()
        val res =
          try {
            val df = SparkEntry.queries(name)(spark, sfDir)
            if (action == "count") df.count()
            else df.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[extra] $name failed: ${e.getMessage}")
            -1.0
          }
        name -> res
      }
      val wall = (System.nanoTime() - w0) / 1e9
      val qs = rows.map { case (k, v) => "\"" + k + "\":" + r2(v) }
        .mkString("{", ",", "}")
      println(s"""{"bench_extra":"$label","action":"$action","sf":"$sfDir","wall":${r2(wall)},"sum":${r2(rows.map(_._2).filter(_ >= 0).sum)},"queries":$qs}""")
    }
    pass("pass1")
    pass("pass2")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: decompose semDedupPairs / cosineNearDup cost at sf0.1. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"ANN_PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup whole thing once
    graft.ann.Similarity.semDedupPairs(emb, 0.25, 16, 4).count()
    t("train+materialize") {
      graft.ann.Similarity.materializeCentroids(
        graft.ann.Similarity.trainCentroids(emb, 16)).count()
    }
    t("train+materialize2") {
      graft.ann.Similarity.materializeCentroids(
        graft.ann.Similarity.trainCentroids(emb, 16)).count()
    }
    t("pairs-full") { graft.ann.Similarity.semDedupPairs(emb, 0.25, 16, 4).count() }
    t("pairs-full2") { graft.ann.Similarity.semDedupPairs(emb, 0.25, 16, 4).count() }
    t("neardup-full") { graft.ann.Similarity.cosineNearDup(emb, 0.25, 4, 16).count() }
    val n = t("bruteNearDup") { graft.ann.Similarity.bruteNearDup(emb, 0.25).count() }
    println("pairs=" + n)
    spark.stop()
  }
}

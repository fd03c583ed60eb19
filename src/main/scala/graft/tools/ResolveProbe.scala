package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: how many propagateMin iterations do the resolve queries run at
  * sf0.1, and what does each cost?
  */
object ResolveProbe {
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
    def probe(name: String, pairs: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val edges = pairs.select(col("a").as("x"), col("b").as("y"))
        .union(pairs.select(col("b").as("x"), col("a").as("y")))
        .localCheckpoint()
      val tEdges = (System.nanoTime() - t0) / 1e9
      var labels = edges.select(col("x")).distinct().withColumn("keeper", col("x"))
        .localCheckpoint()
      var it = 0
      var converged = false
      val iterTimes = scala.collection.mutable.ArrayBuffer[Double]()
      while (!converged && it < 50) {
        val ti = System.nanoTime()
        val viaNeighbor = edges
          .join(labels.select(col("x").as("y"), col("keeper").as("nbr_keeper")), "y")
          .groupBy("x").agg(min(col("nbr_keeper")).as("nk"))
        val joined = labels.join(viaNeighbor, Seq("x"), "left")
          .select(col("x"), col("keeper").as("prev"),
            least(col("keeper"), coalesce(col("nk"), col("keeper"))).as("keeper"))
          .localCheckpoint()
        converged = joined.filter(col("keeper") =!= col("prev")).isEmpty
        labels = joined.select(col("x"), col("keeper"))
        it += 1
        iterTimes += (System.nanoTime() - ti) / 1e9
      }
      println(f"RESOLVE_PROBE $name edges_s=$tEdges%.2f iters=$it iter_s=${iterTimes.map(x => f"$x%.2f").mkString(",")}")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    probe("minhash", graft.dedup.Dedup.minhashCandidates(docs))
    probe("semdedup", graft.ann.Similarity.semDedupPairs(emb, 0.25, 16, 4))
    probe("semdedup2", graft.ann.Similarity.semDedupPairs(emb, 0.25, 16, 4))
    spark.stop()
  }
}

package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table
  * (vec_id, embedding: array<float>, label).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the full corpus; one scan, no shuffle of the corpus, a
  *    partial top-k per partition via window after repartition by query.
  *    This is the correctness baseline and is how you'd score ≤ a few
  *    thousand queries against 10⁹ vectors on a cluster.
  *  - [[lshBuckets]] / [[lshTopK]]: sign-random-projection LSH — each
  *    vector is bucketed by the sign pattern of `nPlanes` deterministic
  *    hyperplanes; candidates = same-bucket vectors only. The scale path:
  *    the corpus-side shuffle is keyed by bucket, queries only meet
  *    their bucket.
  *
  * Dot products use sequential double folds (aggregate over zip_with) so
  * results are bit-reproducible and engine-portable.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays (bit-deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact top-k neighbors for each query vector (queries = vec_id ∈
    * querySet), excluding self. Output: (q, rank, neighbor).
    */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val queries = broadcast(
      emb.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("q"), asDouble(col("embedding")).as("q_emb")))
    val cands = emb.select(col("vec_id").as("neighbor"), asDouble(col("embedding")).as("c_emb"))
    val scored = cands.join(queries, col("q") =!= col("neighbor"))
      .select(col("q"), col("neighbor"), cosine(col("q_emb"), col("c_emb")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy(col("sim").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q"), col("rank"), col("neighbor"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * md5-derived value in [-0.5, 0.5). Engine-portable.
    */
  private def planeComponent(plane: Int, d: Column): Column =
    (conv(substring(md5(concat(lit(s"p$plane-"), d.cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)) - 0.5

  /** Sign-random-projection bucket id: one bit per hyperplane. */
  def lshBucket(embDouble: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(embDouble, sequence(lit(1), size(embDouble)),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** (vec_id, bucket) for the whole corpus. */
  def lshBuckets(emb: DataFrame, nPlanes: Int = 8): DataFrame =
    emb.select(col("vec_id"),
      lshBucket(asDouble(col("embedding")), nPlanes).as("bucket"))

  /** Approximate top-k: exact cosine ranking restricted to the query's LSH
    * bucket. Recall depends on nPlanes; candidates shrink ~2^nPlanes-fold.
    */
  def lshTopK(emb: DataFrame, queryIds: Seq[Long], k: Int, nPlanes: Int = 8): DataFrame = {
    val bucketed = emb.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("bucket", lshBucket(col("emb"), nPlanes))
    val queries = broadcast(bucketed.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q"), col("emb").as("q_emb"), col("bucket")))
    val scored = bucketed.join(queries, Seq("bucket"))
      .filter(col("q") =!= col("vec_id"))
      .select(col("q"), col("vec_id").as("neighbor"),
        cosine(col("q_emb"), col("emb")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy(col("sim").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q"), col("rank"), col("neighbor"))
  }

  /** IVF-flat: a training-free coarse quantizer — the first `nCentroids`
    * vectors act as centers (deterministic, no k-means pass); every vector
    * is assigned to its best center by cosine. Queries probe their
    * `nProbe` best centers and exact-rerank only those inverted lists.
    * At scale the corpus shuffles once by centroid id and each query
    * touches nProbe/nCentroids of the data.
    */
  def ivfAssign(emb: DataFrame, nCentroids: Int): DataFrame = {
    val cents = broadcast(emb.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), asDouble(col("embedding")).as("cent_emb")))
    val scored = emb.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .join(cents)
      .select(col("vec_id"), col("emb"), col("cent_id"),
        cosine(col("emb"), col("cent_emb")).as("cscore"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cscore").desc, col("cent_id").asc)
    scored.withColumn("crank", row_number().over(w))
  }

  /** Approximate top-k via IVF: probe the query's nProbe best centroids,
    * exact-rerank the union of their lists. Output: (q, rank, neighbor).
    */
  def ivfTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val assigned = ivfAssign(emb, nCentroids)
    val lists = assigned.filter(col("crank") === 1)
      .select(col("cent_id"), col("vec_id").as("neighbor"), col("emb").as("c_emb"))
    val probes = broadcast(assigned
      .filter(col("vec_id").isin(queryIds: _*) && col("crank") <= nProbe)
      .select(col("vec_id").as("q"), col("emb").as("q_emb"), col("cent_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy(col("sim").desc, col("neighbor").asc)
    lists.join(probes, Seq("cent_id"))
      .filter(col("q") =!= col("neighbor"))
      .select(col("q"), col("neighbor"), cosine(col("q_emb"), col("c_emb")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q"), col("rank"), col("neighbor"))
  }

  /** Embedding-cosine near-duplicate pairs at `threshold`, LSH-bucketed so
    * only same-bucket pairs are compared (the corpus never self-cross-joins).
    */
  def cosineNearDup(emb: DataFrame, threshold: Double, nPlanes: Int = 6): DataFrame = {
    val bucketed = emb.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("bucket", lshBucket(col("emb"), nPlanes))
    val l = bucketed.select(col("bucket"), col("vec_id").as("a"), col("emb").as("emb_a"))
    val r = bucketed.select(col("bucket").as("bucket_r"), col("vec_id").as("b"),
      col("emb").as("emb_b"))
    l.join(r, l("bucket") === r("bucket_r") && l("a") < r("b"))
      .select(col("a"), col("b"), cosine(col("emb_a"), col("emb_b")).as("sim"))
      .filter(col("sim") >= threshold)
      .select("a", "b")
  }
}

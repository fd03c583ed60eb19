package graft

import graft.dedup.Dedup

/** Keeper resolution over duplicate-pair graphs (the dedup decision step);
  * the candidate generators themselves are DuckDB-oracle-checked.
  */
class DedupSpec extends SparkSpec {

  private def resolve(pairs: Seq[(Long, Long)], maxIters: Int = 50): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Dedup.resolveKeepers(pairs.toDF("a", "b"), maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("clique and chain both collapse to the minimum member") {
    // clique {1,2,3} + chain 10-11-12-13
    val got = resolve(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("separate components keep separate keepers") {
    val got = resolve(Seq((5L, 6L), (20L, 21L)))
    assert(got == Map(5L -> 5L, 6L -> 5L, 20L -> 20L, 21L -> 20L))
  }

  test("a 10-hop chain converges to a true fixed point (every keeper keeps itself)") {
    // path 1-2-…-11: needs 10 propagation hops; the pre-r03 fixed iters=3
    // left keeper(x)=y with keeper(y)=z on exactly this shape (ADVICE r02)
    val chain = (1L to 10L).map(i => (i, i + 1))
    val got = resolve(chain)
    assert(got.values.toSet == Set(1L))
    // fixed-point property: every assigned keeper is its own keeper
    assert(got.values.forall(k => got(k) == k))
  }

  test("quality-priority keepers: component keeps its best member, ties break to lowest id") {
    val s = spark
    import s.implicits._
    // chain 1-2-3 (prio favors 3), clique 10-11-12 (tie on prio -> min id),
    // pair 20-21 (missing prio defaults to 0 -> 20 wins on prio)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)).toDF("a", "b")
    val prio = Seq((1L, 5L), (2L, 7L), (3L, 9L), (10L, 4L), (11L, 4L),
      (12L, 4L), (20L, 2L)).toDF("doc_id", "prio")
    val got = Dedup.resolveKeepersBy(pairs, prio)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(got(_) == 3L), "chain keeps highest prio via hops")
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L), "prio tie -> lowest id")
    assert(got(20L) == 20L && got(21L) == 20L, "absent prio defaults below present")
    // every keeper keeps itself (fixed point)
    got.values.toSet.foreach { (k: Long) => assert(got(k) == k) }
  }

  test("band-pair simhash candidates: full recall of hamming <= 6 vs brute-force all-pairs") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = Dedup.simhashDocs(docs)
    val a = sh.select(col("doc_id").as("a"), col("sh64").as("ha"))
    val b = sh.select(col("doc_id").as("b"), col("sh64").as("hb"))
    val truth = a.join(b, col("a") < col("b"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 6)
      .select("a", "b")
    val cand = Dedup.simhashCandidates(docs).select("a", "b")
    assert(truth.count() > 0, "corpus should contain near-dup fingerprints")
    assert(truth.exceptAll(cand).isEmpty,
      "a true hamming<=6 pair escaped the C(8,2) band-pair index")
    // and the guarantee's precondition is enforced
    intercept[IllegalArgumentException] {
      Dedup.simhashCandidates(docs, maxHamming = 7)
    }
  }

  test("maxIters too small for the diameter fails loudly, never silently partial") {
    val chain = (1L to 10L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException](resolve(chain, maxIters = 2))
    assert(e.getMessage.contains("did not converge"))
  }
}

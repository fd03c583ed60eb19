package graft

import graft.dedup.Dedup

/** Keeper resolution over duplicate-pair graphs (the dedup decision step);
  * the candidate generators themselves are DuckDB-oracle-checked.
  */
class DedupSpec extends SparkSpec {

  private def resolve(pairs: Seq[(Long, Long)], iters: Int = 3): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Dedup.resolveKeepers(pairs.toDF("a", "b"), iters)
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

  test("propagation is bounded by iters (documented chain behavior)") {
    // path 1-2-3-4-5: with one iteration, 5 only sees 4's INITIAL keeper
    val oneIter = resolve(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), iters = 1)
    assert(oneIter(2L) == 1L && oneIter(5L) == 4L)
    // the 4-hop path needs 4 iterations (one hop of label travel per iter)
    val fourIter = resolve(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), iters = 4)
    assert(fourIter.values.toSet == Set(1L))
  }
}

package graft

import graft.operators.{Metrics, Route}
import graft.sources.Transcripts
import org.apache.spark.sql.Observation

class MetricsSpec extends SparkSpec {

  test("observe collects drop counters during the routing action (no second scan)") {
    val turns = mkTurns(Seq(
      ("c1", 1, "user", "EVENT insert rows=1 vals=[1|a|b]", "search"), // routed
      ("c1", 2, "user", "EVENT insert rows=1 vals=[1|a|b]", "zzz"), // unmapped
      ("c1", 3, "user", "EVENT update rows=3 vals=[1|a|x];[1|a|y];[1|a|z]", "search"), // odd: quarantined
      ("c1", 4, "user", "EVENT query stmt=BEGIN", ""), // suppressed
      ("c1", 5, "user", "just noise", ""), // noise
      ("c1", 6, "user", "EVENT commit xid=5", "search"),
      ("c2", 1, "user", "EVENT insert rows=1 vals=[1|a|b]", "search"))) // uncommitted
    val obs = Observation("graft-test")
    val enriched = Metrics.observe(
      Pipeline.enriched(turns, Transcripts.lookup(spark)), obs)
    val routed = Route.messages(enriched)
    assert(routed.count() == 1) // only the committed, mapped, even insert
    val m = obs.get
    assert(m("turns") == 7L)
    assert(m("row_events") == 4L)
    assert(m("query_suppressed") == 1L)
    assert(m("noise") == 1L)
    assert(m("dropped_unmapped") == 1L)
    assert(m("dropped_uncommitted") == 1L)
    assert(m("quarantined_odd_updates") == 1L)
  }
}

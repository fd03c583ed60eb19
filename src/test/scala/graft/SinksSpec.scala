package graft

import graft.checkpoint.Sinks
import graft.operators.{Parse, TxnStamp}
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Resumable fan-out sink (FIXTURES.md F11) + salted stamping parity (F04). */
class SinksSpec extends SparkSpec {

  private def routedSf001 =
    Pipeline.routedFromEvents(spark, "/root/testdata/sf0.001")

  test("fan-out write + resume equals single run (F11)") {
    val tmpA = Files.createTempDirectory("graft-single").toString
    val tmpB = Files.createTempDirectory("graft-resumed").toString
    val routed = routedSf001

    // single run
    assert(Sinks.writeResumable(routed, tmpA, nBuckets = 8, source = "sf0.001") == 8)

    // interrupted run: only buckets 0-2 get committed (simulated by
    // pre-marking 3..7 done, writing, then clearing the fake manifests)
    val mdir = java.nio.file.Paths.get(tmpB, "_manifests")
    Files.createDirectories(mdir)
    (3 until 8).foreach(b => Files.writeString(mdir.resolve(s"bucket-$b.json"), "{}"))
    assert(Sinks.writeResumable(routed, tmpB, 8, "sf0.001") == 3)
    (3 until 8).foreach(b => Files.delete(mdir.resolve(s"bucket-$b.json")))

    // resume: completes exactly the missing 5 buckets
    assert(Sinks.writeResumable(routed, tmpB, 8, "sf0.001") == 5)
    // idempotent: nothing left
    assert(Sinks.writeResumable(routed, tmpB, 8, "sf0.001") == 0)

    // resumed output == single-run output (per-sink counts and full rows)
    val a = Sinks.committedSinkCounts(spark, tmpA).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val b = Sinks.committedSinkCounts(spark, tmpB).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(a == b && a.nonEmpty)

    val rowsA = spark.read.parquet(s"$tmpA/routed")
      .select("conv_id", "turn_idx", "event_type", "row_repr", "text").collect()
      .map(_.toString).sorted
    val rowsB = spark.read.parquet(s"$tmpB/routed")
      .select("conv_id", "turn_idx", "event_type", "row_repr", "text").collect()
      .map(_.toString).sorted
    assert(rowsA.sameElements(rowsB))

    // manifests carry lineage + counts
    val manifest = Files.readString(java.nio.file.Paths.get(tmpA, "_manifests", "bucket-0.json"))
    assert(manifest.contains("\"source\": \"sf0.001\"") && manifest.contains("n_routed"))
  }

  test("salted stamping equals plain window stamping, incl. a hot conversation (F04)") {
    // 1 hot conversation with 500 turns + commits only near the end blocks
    val hot = (1 to 500).map { i =>
      val text = if (i == 450) "EVENT commit xid=450"
        else if (i == 490) "EVENT commit xid=490"
        else if (i % 3 == 0) s"EVENT insert rows=1 vals=[$i|a|b]"
        else "noise line"
      ("hot", i, "user", text, "search")
    }
    val cold = Seq(("cold", 1, "user", "EVENT insert rows=1 vals=[1|a|b]", "search"),
      ("cold", 2, "user", "EVENT commit xid=7", "search"))
    val parsed = Parse.parse(mkTurns(hot ++ cold))
    val plain = TxnStamp.stamp(parsed)
      .select("conv_id", "turn_idx", "txn_id").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> Option(r.get(2))).toMap
    val salted = TxnStamp.stampSalted(parsed, blockSize = 64)
      .select("conv_id", "turn_idx", "txn_id").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> Option(r.get(2))).toMap
    assert(plain == salted)
    assert(plain(("hot", 1)).contains(450L))
    assert(plain(("hot", 451)).contains(490L))
    assert(plain(("hot", 491)).isEmpty) // after last commit: never drained
    assert(plain(("cold", 1)).contains(7L))
  }
}

package graft

import graft.model.Turn
import graft.operators.Sessionize
import java.sql.Timestamp

/** Gap-based sessionization semantics. */
class SessionizeSpec extends SparkSpec {

  private def turnAt(c: String, i: Int, epochSec: Long) =
    Turn(c, i, "user", s"note $i", "search", new Timestamp(epochSec * 1000L))

  test("a gap over the threshold starts a new session; first turn starts session 1") {
    val s = spark
    import s.implicits._
    val base = 1700000000L
    val turns = Seq(
      turnAt("ca", 1, base),
      turnAt("ca", 2, base + 100), // same session
      turnAt("ca", 3, base + 100 + 3601), // gap > 3600 -> session 2
      turnAt("ca", 4, base + 100 + 3601 + 3600), // gap == 3600 -> same session
      turnAt("cb", 1, base) // other conversation -> its own session 1
    ).toDF()
    val got = Sessionize.sessionize(turns, gapSeconds = 3600)
      .select("conv_id", "turn_idx", "session_seq", "session_id")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    assert(got(("ca", 1)) == (1L, "ca#1"))
    assert(got(("ca", 2)) == (1L, "ca#1"))
    assert(got(("ca", 3)) == (2L, "ca#2"))
    assert(got(("ca", 4)) == (2L, "ca#2"))
    assert(got(("cb", 1)) == (1L, "cb#1"))
  }

  test("native session_window: merges on exact-gap touch, splits past it") {
    val s = spark
    import s.implicits._
    val base = 1700000000L
    val turns = Seq(
      turnAt("cw", 1, base),
      turnAt("cw", 2, base + 3600), // exact-gap touch -> merges (non-strict)
      turnAt("cw", 3, base + 3600 + 3601) // gap > 3600 -> NEW session
    ).toDF()
    val got = Sessionize.sessionWindowBounds(turns, "1 hour")
      .collect().map(r => r.getAs[Int]("first_turn") ->
        (r.getAs[Int]("last_turn"), r.getAs[Long]("n_turns"))).toMap
    assert(got(1) == (2, 2L)) // turns 1-2 one session (touch merged)
    assert(got(3) == (3, 1L)) // turn 3 its own session
  }

  test("sessionBounds reports envelope per session") {
    val s = spark
    import s.implicits._
    val base = 1700000000L
    val turns = Seq(
      turnAt("cc", 1, base), turnAt("cc", 2, base + 10),
      turnAt("cc", 3, base + 10000)).toDF()
    val bounds = Sessionize.sessionBounds(
      Sessionize.sessionize(turns, gapSeconds = 3600))
      .collect().map(r => r.getLong(1) ->
        (r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    assert(bounds(1L) == (1, 2, 2L))
    assert(bounds(2L) == (3, 3, 1L))
  }

  test("roleTransitions counts adjacent role pairs per conversation") {
    val turns = mkTurns(Seq(
      ("c1", 0, "user", "hi", ""), ("c1", 1, "assistant", "yo", ""),
      ("c1", 2, "tool", "x", "grep"), ("c1", 3, "assistant", "done", ""),
      ("c2", 0, "user", "q", ""), ("c2", 1, "assistant", "a", "")))
    val out = Sessionize.roleTransitions(turns)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("user", "assistant") -> 2L,
      ("assistant", "tool") -> 1L,
      ("tool", "assistant") -> 1L))
  }
}

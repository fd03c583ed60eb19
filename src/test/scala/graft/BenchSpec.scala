package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Pins the graded bench stdout line's byte budget against the LIVE query
  * set: the round driver keeps only a ~2 KB tail of the run output
  * (r01/r02 shipped `parsed: null` by blowing it), so whatever fallback
  * tier [[Bench.stdoutLine]] selects must stay under 1850 B while keeping
  * every per-query second AND every scaling pair's efficiency. Run with
  * adversarial magnitudes (every query at a 4-char seconds value) so a new
  * `queries` entry that pushes past the budget fails HERE, not in the
  * driver's artifact.
  */
class BenchSpec extends AnyFunSuite {

  private val om = new ObjectMapper()
  private val pairs = List(
    Bench.PairStat(2, 8, 8000000L, 38.30, 9.53, 1.0),
    Bench.PairStat(8, 32, 8000000L, 9.53, 4.09, 0.582),
    Bench.PairStat(8, 32, 32000000L, 38.33, 14.36, 0.667))

  /** Pair efficiencies however the selected tier encodes them: the object
    * form (tiers 1/2) or the `"N->4N@turns": eff` dict form (tier 2b).
    */
  private def pairEffs(scaling: JsonNode): Seq[Double] = {
    val node = scaling.get("pairs")
    if (node == null) Nil
    else if (node.isArray)
      node.elements().asScala.map(_.get("efficiency").asDouble).toSeq
    else node.fieldNames().asScala.map(f => node.get(f).asDouble).toSeq
  }

  /** Hard ceiling for the EMITTED line: the driver keeps the last ~2048 B
    * of stdout and the sbt epilogue after the line measures ~74 B
    * (r5 run), so anything ≤ 1960 B survives with margin. The 1850 B
    * budget inside stdoutLine is the tier-SELECTION threshold; at 70+
    * queries the last-resort tier exceeds it by design (it is bounded by
    * the query-name set) and this ceiling is what actually matters.
    */
  private val EmitCeiling = 1960

  test("selected tier keeps all query secs + all pair efficiencies in the tail window") {
    // 7.77 → "7.8" under the adaptive tiers: the realistic WORST per-query
    // width (sub-10-second values are 3 chars; ≥10 s rounds to 2)
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 7.77)
    val line = Bench.stdoutLine(777.77, results, Nil, "/root/testdata/sf0.1",
      8000000L, 1954542L, 38.30, 9.53, 1.0, pairs)
    assert(line.length <= EmitCeiling, s"selected line is ${line.length} B, over budget")
    val root = om.readTree(line) // throws on malformed JSON
    val qs = root.get("queries")
    val missing = SparkEntry.queries.keys.filterNot(k => qs.has(k))
    assert(missing.isEmpty, s"per-query seconds dropped for: $missing")
    assert(pairEffs(root.get("scaling")).sorted == Seq(0.582, 0.667, 1.0),
      s"pair efficiencies lost from the selected tier:\n$line")
    assert(root.get("scaling").get("efficiency").asDouble == 1.0)
  }

  test("unbounded error strings degrade to a count, still parseable") {
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 7.77)
    val errors = results.take(10).map { case (k, _) => k -> ("boom " * 40) }
    val line = Bench.stdoutLine(777.77, results, errors, "/root/testdata/sf0.1",
      8000000L, 1954542L, 38.30, 9.53, 1.0, pairs)
    assert(line.length <= EmitCeiling, s"error-fallback line is ${line.length} B")
    val root = om.readTree(line)
    assert(root.has("query_errors") || root.get("errors_n").asInt == 10)
  }
}

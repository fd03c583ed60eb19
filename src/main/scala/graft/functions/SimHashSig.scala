package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom expression computing the 32-bit SimHash fingerprint from a token
  * array in one compiled pass — replaces 32 interpreted `filter()` HOFs
  * (one per bit, each walking the token-hash array) whose combined
  * expression tree also dominated janino compile time when the self-join
  * in `simhashCandidates` inlined it into BOTH join branches.
  *
  * Value semantics bit-identical to the built-in/DuckDB form (verified by
  * the dedup_simhash / dedup_simhash_pairs oracles): per token, h = first
  * 4 md5 bytes as an unsigned 32-bit int (= `('0x'||substr(md5(t),1,8))
  * ::BIGINT`); fingerprint bit j is set iff 2·|{t : bit j of h(t) = 1}| ≥
  * token count.
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(toksAny: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val counts = new Array[Int](32)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(toks.getUTF8String(i).getBytes)
      val x = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < 32) {
        counts(j) += ((x >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < 32) {
      if (2 * counts(j) >= n) sh |= (1L << j)
      j += 1
    }
    sh
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  val Name = "graft_simhash_sig"

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => SimHashSig(exprs.head), "built-in")

  /** Column API (requires [[register]]); input: token array. */
  def apply(tokens: Column): Column =
    org.apache.spark.sql.functions.call_function(Name, tokens)
}

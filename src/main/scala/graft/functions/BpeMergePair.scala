package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the q132/q135 BPE token-merge pass:
  * `graft_bpe_merge(text, pair)` rewrites every token-bounded
  * occurrence of the winner bigram "a b" to "a_b", left-to-right.
  *
  * Semantics are EXACTLY the declarative fold both engines share
  * (Spark `aggregate()` ≡ DuckDB `list_reduce()` — WinnowingSpec pins
  * the equality on the corpus plus boundary cases): a merge fires
  * only on an exact (a, b) token bigram — never across token
  * boundaries — and a merged token leaves the window, so "a a a"
  * under "a a" yields "a_a a".
  *
  * Why native: the fold is a HigherOrderFunction chain (split →
  * aggregate with per-token lambda), which Spark evaluates WITHOUT
  * whole-stage codegen and with a per-token string concat that is
  * quadratic in document length. The key observation here: the merged
  * token "a_b" is byte-for-byte the bigram "a b" with the separator
  * space overwritten by '_', so the merge pass is ONE linear scan
  * over the UTF-8 bytes that patches matched separator positions in
  * a single copy — no token array, no accumulator string, no
  * allocation beyond the output buffer. (A space byte never occurs
  * inside a UTF-8 multibyte sequence, so byte-level token bounds are
  * character-exact.) The merge is the map-only half of every BPE
  * round over the whole corpus ×3, part of the suite's slowest
  * query — this is the hot path the expression exists for.
  */
case class BpeMergePair(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_merge expects (string text, string pair), got ($a, $b)")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_bpe_merge"

  override protected def nullSafeEval(text: Any, pair: Any): Any =
    BpeMergePair.merge(text.asInstanceOf[UTF8String],
      pair.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = graft.functions.BpeMergePair.merge($t, $p);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BpeMergePair = copy(left = newLeft, right = newRight)
}

object BpeMergePair {

  /** Static worker shared by eval and the generated code. A pair
    * without a space (malformed winner) merges nothing. */
  def merge(text: UTF8String, pair: UTF8String): UTF8String = {
    val t = text.getBytes
    val pr = pair.getBytes
    // split the pair at its FIRST space: a = pr[0,sp), b = pr(sp,len)
    var sp = 0
    while (sp < pr.length && pr(sp) != ' '.toByte) sp += 1
    if (sp == pr.length) return text // no space: nothing can match
    val lenA = sp
    val lenB = pr.length - sp - 1
    val out = java.util.Arrays.copyOf(t, t.length)
    var i = 0
    var patched = false
    while (i < t.length) {
      // token starts at i; e = its exclusive end (next space or EOS)
      var e = i
      while (e < t.length && t(e) != ' '.toByte) e += 1
      var matched = false
      if (e - i == lenA && e < t.length) {
        // token == a? then the next token must equal b and be bounded
        var k = 0
        while (k < lenA && t(i + k) == pr(k)) k += 1
        if (k == lenA) {
          val b0 = e + 1
          var eb = b0
          while (eb < t.length && t(eb) != ' '.toByte) eb += 1
          if (eb - b0 == lenB) {
            var j = 0
            while (j < lenB && t(b0 + j) == pr(sp + 1 + j)) j += 1
            if (j == lenB) {
              out(e) = '_'.toByte // the merge IS the separator patch
              patched = true
              i = eb + 1 // the merged token leaves the window
              matched = true
            }
          }
        }
      }
      if (!matched) i = e + 1
    }
    if (patched) UTF8String.fromBytes(out) else text
  }
}

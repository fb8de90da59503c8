package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity — the fuzzy-name scorer the record
  * linkage family uses when edit distance is too coarse (transposition
  * tolerant, prefix weighted). Implemented as a codegen'd Catalyst
  * expression (SURVEY §2.11 preference order: native Expression over
  * UDF) so blocked pairwise scoring stays inside whole-stage codegen.
  *
  * Semantics pinned to the COMMON reference convention so a DuckDB
  * oracle (`jaro_winkler_similarity`) reproduces it bit-for-bit at
  * 4dp (verified over all 2016 distinct part-name pairs + the classic
  * martha/marhta, dixon/dicksonx, jellyfish/smellyfish vectors):
  *   - either side empty -> 0.0 (even when both are empty);
  *   - match window `max(len)/2 - 1`, transpositions halved;
  *   - Winkler prefix boost (scale 0.1, prefix capped at 4) applied
  *     ONLY when jaro > 0.7 (the boost-threshold variant DuckDB and
  *     the common Rust/C++ implementations use).
  * Comparison is per UTF-16 char (ASCII-safe; supplementary-plane
  * text compares surrogate-wise on both engines).
  */
object StringSimExprs {

  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinklerExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

object StringSimOps {

  def jaroWinkler(aU: UTF8String, bU: UTF8String): Double = {
    val s1 = aU.toString
    val s2 = bU.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val md = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(i + md + 1, l2)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    if (j <= 0.7) j
    else {
      var l = 0
      val maxL = math.min(4, math.min(l1, l2))
      while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }
}

case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSimOps.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSimOps.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

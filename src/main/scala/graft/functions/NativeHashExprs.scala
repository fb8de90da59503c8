package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup hot path.
  *
  * The builtin-composition forms (`transform`/`filter`/`array_min`
  * chains) are semantically right but run INTERPRETED — Spark's
  * higher-order functions don't participate in codegen — and worse,
  * a lambda that references the outer token array re-evaluates that
  * subexpression per element, making shingling quadratic per document.
  * At 100 TB the signature stage is the whole map-side cost of dedup,
  * so it gets the custom-Expression treatment (SURVEY §2.11 preference
  * order: native Expression with doGenCode over UDF): one tight JVM
  * pass per row via a static call, which keeps the operator inside
  * whole-stage codegen spans.
  *
  * Semantics are bit-identical to the builtin forms (same md5-derived
  * 60-bit hashes, same universal-hash arithmetic, same ordering), so
  * the DuckDB oracle SQL is unchanged.
  */
object NativeHashExprs {

  /** Distinct hashed word n-gram shingles of `text`, one in-row pass:
    * trim spaces, split on single spaces, n-gram, md5-60bit, distinct
    * in first-occurrence order. Empty array when fewer than n tokens.
    */
  def hashedShingles(text: Column, n: Int): Column =
    ExpressionUtils.column(
      HashedShinglesExpr(ExpressionUtils.expression(text), n))

  /** MinHash signature array: sig(i) = min over shingle hashes h of
    * ((h mod p) * a_i + b_i) mod p, all k hashes in one pass.
    */
  def minhashSig(hs: Column, coeffs: Seq[(Long, Long)], prime: Long): Column =
    ExpressionUtils.column(
      MinhashSigExpr(ExpressionUtils.expression(hs), coeffs, prime))

  /** 60-bit frequency-weighted SimHash of the whitespace tokens of
    * `text` (duplicates kept); null when the doc has no tokens.
    */
  def simhash60(text: Column): Column =
    ExpressionUtils.column(Simhash60Expr(ExpressionUtils.expression(text)))

  /** Winnowing fingerprints: hash every word n-gram with the seed-0
    * hash (`"0:" + shingle`), slide a `window`-wide rolling min over
    * the POSITIONAL (non-distinct) shingle hashes, dedupe in
    * first-occurrence order. Empty array when fewer than n tokens.
    */
  def winnowFingerprints(text: Column, n: Int, window: Int): Column =
    ExpressionUtils.column(
      WinnowFingerprintsExpr(ExpressionUtils.expression(text), n, window))

  /** All word n-gram shingles as STRINGS (duplicates kept, document
    * order) — the native twin of `TextFunctions.shingles` for
    * frequency-counting consumers; bit-identical output.
    */
  def stringShingles(text: Column, n: Int): Column =
    ExpressionUtils.column(
      StringShinglesExpr(ExpressionUtils.expression(text), n))

  /** POSITIONAL hashed k-grams: element i is the 60-bit md5-derived
    * hash of the k-gram starting at token i — duplicates kept, document
    * order, one in-row pass (the [[hashedShingles]] kernel without the
    * distinct). Empty array when fewer than k tokens. The substrate of
    * exact-substring span dedup, where POSITION identity matters.
    */
  def positionalKgramHashes(text: Column, k: Int): Column =
    ExpressionUtils.column(
      PositionalKgramHashesExpr(ExpressionUtils.expression(text), k))

  /** Tokens of `toks` OUTSIDE the union of the k-wide windows starting
    * at the SORTED positions `dupPos`, re-joined with single spaces —
    * one linear two-pointer pass. The per-token
    * `array_contains(covered, i)` membership form is
    * O(tokens × covered) per row: a long, heavily-duplicated document
    * stalls its whole task (the substring-dedup family's one
    * quadratic, now gone).
    */
  def removeCoveredTokens(toks: Column, dupPos: Column, k: Int): Column =
    ExpressionUtils.column(RemoveCoveredTokensExpr(
      ExpressionUtils.expression(toks),
      ExpressionUtils.expression(dupPos), k))

  /** |union of the k-wide windows starting at the sorted `dupPos`| —
    * the removed-token count, one linear merged-interval pass.
    */
  def coveredCount(dupPos: Column, k: Int): Column =
    ExpressionUtils.column(CoveredCountExpr(
      ExpressionUtils.expression(dupPos), k))

  /** Occurrence count of a literal token phrase (overlaps counted),
    * one pass; 0 for docs shorter than the phrase.
    */
  def phraseCount(text: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty && phrase.forall(_.nonEmpty),
      "phrase_count: phrase must be non-empty tokens (no empty strings)")
    ExpressionUtils.column(
      PhraseCountExpr(ExpressionUtils.expression(text), phrase))
  }

  /** Minimum element of the intersection of two SORTED-ascending long
    * arrays (null when disjoint): one two-pointer pass, no per-row hash
    * set — `array_min(array_intersect(x, y))` costs ~2 µs/row building
    * an OpenHashSet per evaluation, which dominated the blocked-Jaccard
    * verify join; this is ~20 comparisons and zero allocation.
    */
  def sortedInterMin(x: Column, y: Column): Column =
    ExpressionUtils.column(SortedInterMinExpr(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))

  /** |intersection| of two SORTED-ascending long arrays — allocation-
    * free twin of `size(array_intersect(x, y))` (inputs must each be
    * duplicate-free, as shingle sets are).
    */
  def sortedInterCount(x: Column, y: Column): Column =
    ExpressionUtils.column(SortedInterCountExpr(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))
}

/** Static row kernels called from both interpreted eval and generated
  * code (a `defineCodeGen` one-liner keeps whole-stage codegen intact).
  */
object ShingleOps {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of md5 parsed base 16 — bit-identical to
    * `conv(substring(md5(x), 1, 15), 16, 10)` and DuckDB's
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`: md5 bytes 0..6 then the
    * high nibble of byte 7. Always in [0, 2^60).
    */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >>> 4)
  }

  def hash60(s: String): Long =
    hash60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Space-separated tokens of space-trimmed `text` (empties dropped) —
    * parity with `filter(split(trim(text), " "), t => t =!= "")`.
    */
  private def tokens(text: UTF8String): java.util.ArrayList[String] = {
    val s = text.trim().toString
    val toks = new java.util.ArrayList[String]()
    val len = s.length
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) toks.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    toks
  }

  def hashedShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = tokens(text)
    val m = toks.size
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j <= m - n) {
      sb.setLength(0)
      var q = 0
      while (q < n) {
        if (q > 0) sb.append(' ')
        sb.append(toks.get(j + q))
        q += 1
      }
      seen.add(hash60(sb.toString))
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** All n-gram shingles as strings, duplicates kept, document order. */
  def stringShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = tokens(text)
    val m = toks.size
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j <= m - n) {
      sb.setLength(0)
      var q = 0
      while (q < n) {
        if (q > 0) sb.append(' ')
        sb.append(toks.get(j + q))
        q += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Positional (non-distinct) hashed k-grams, document order. */
  def positionalKgramHashes(text: UTF8String, k: Int): ArrayData = {
    val toks = tokens(text)
    val m = toks.size
    if (m < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - k + 1)
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j <= m - k) {
      sb.setLength(0)
      var q = 0
      while (q < k) {
        if (q > 0) sb.append(' ')
        sb.append(toks.get(j + q))
        q += 1
      }
      out(j) = hash60(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Tokens outside the union of [p, p+k) windows over sorted
    * positions, space-joined — linear two-pointer pass.
    */
  def removeCoveredTokens(toks: ArrayData, dupPos: ArrayData,
      k: Int): UTF8String = {
    val m = toks.numElements()
    val np = dupPos.numElements()
    val sb = new java.lang.StringBuilder()
    var pi = 0
    var coverEnd = -1 // exclusive end of the coverage seen so far
    var t = 0
    while (t < m) {
      while (pi < np && dupPos.getInt(pi) <= t) {
        val e = dupPos.getInt(pi) + k
        if (e > coverEnd) coverEnd = e
        pi += 1
      }
      if (t >= coverEnd) {
        if (sb.length > 0) sb.append(' ')
        sb.append(toks.getUTF8String(t).toString)
      }
      t += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Union size of the [p, p+k) windows over sorted positions —
    * linear merged-interval pass.
    */
  def coveredCount(dupPos: ArrayData, k: Int): Int = {
    var total = 0
    var prevEnd = 0
    var i = 0
    while (i < dupPos.numElements()) {
      val p = dupPos.getInt(i)
      val s = math.max(p, prevEnd)
      val e = p + k
      if (e > s) total += e - s
      if (e > prevEnd) prevEnd = e
      i += 1
    }
    total
  }

  /** Occurrences of the literal token `phrase` (overlaps counted). */
  def phraseCount(text: UTF8String, phrase: Array[String]): Int = {
    val toks = tokens(text)
    val m = toks.size
    val k = phrase.length
    if (m < k) return 0
    var cnt = 0
    var i = 0
    while (i <= m - k) {
      var q = 0
      var ok = true
      while (ok && q < k) {
        if (toks.get(i + q) != phrase(q)) ok = false
        q += 1
      }
      if (ok) cnt += 1
      i += 1
    }
    cnt
  }

  def minhashSig(hs: ArrayData, a: Array[Long], b: Array[Long],
      prime: Long): ArrayData = {
    val n = hs.numElements()
    val k = a.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i) % prime
      var j = 0
      while (j < k) {
        // h < p < 2^31 and a_j < p, so h * a_j + b_j < 2^62: no overflow.
        val v = (h * a(j) + b(j)) % prime
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def winnowFingerprints(text: UTF8String, n: Int,
      window: Int): ArrayData = {
    val toks = tokens(text)
    val m = toks.size
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val cnt = m - n + 1
    val hs = new Array[Long](cnt)
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j < cnt) {
      sb.setLength(0)
      sb.append("0:")
      var q = 0
      while (q < n) {
        if (q > 0) sb.append(' ')
        sb.append(toks.get(j + q))
        q += 1
      }
      hs(j) = hash60(sb.toString)
      j += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < cnt) {
      val start = math.max(0, i - window + 1)
      var mn = Long.MaxValue
      var k = start
      while (k <= i) { if (hs(k) < mn) mn = hs(k); k += 1 }
      seen.add(mn)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Min of the intersection of two sorted-ascending long arrays;
    * Long.MinValue marks "disjoint" (hash60 values are in [0, 2^60),
    * so the sentinel is unambiguous) — the expression maps it to null.
    */
  def sortedInterMin(x: ArrayData, y: ArrayData): Long = {
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    while (i < n && j < m) {
      val a = x.getLong(i)
      val b = y.getLong(j)
      if (a == b) return a
      else if (a < b) i += 1
      else j += 1
    }
    Long.MinValue
  }

  /** |intersection| of two sorted-ascending duplicate-free long arrays. */
  def sortedInterCount(x: ArrayData, y: ArrayData): Int = {
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val a = x.getLong(i)
      val b = y.getLong(j)
      if (a == b) { c += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    c
  }

  /** null-marker variant is handled by the expression: returns
    * Long.MinValue for "no tokens" so the expression can emit null.
    */
  def simhash60(text: UTF8String): Long = {
    val toks = tokens(text)
    val n = toks.size
    if (n == 0) return Long.MinValue
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hash60(toks.get(i))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (2 * counts(b) - n > 0) sim |= 1L << b
      b += 1
    }
    sim
  }
}

case class HashedShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"
  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.hashedShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.hashedShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PositionalKgramHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "positional_kgram_hashes"
  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.positionalKgramHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleOps.positionalKgramHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RemoveCoveredTokensExpr(left: Expression, right: Expression,
    k: Int) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "remove_covered_tokens"
  override protected def nullSafeEval(toks: Any, dupPos: Any): Any =
    ShingleOps.removeCoveredTokens(toks.asInstanceOf[ArrayData],
      dupPos.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ShingleOps.removeCoveredTokens($a, $b, $k)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class CoveredCountExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "covered_count"
  override protected def nullSafeEval(dupPos: Any): Any =
    ShingleOps.coveredCount(dupPos.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleOps.coveredCount($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WinnowFingerprintsExpr(child: Expression, n: Int, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"
  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.winnowFingerprints(input.asInstanceOf[UTF8String], n, window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleOps.winnowFingerprints($c, $n, $window)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinhashSigExpr(child: Expression, coeffs: Seq[(Long, Long)],
    prime: Long) extends UnaryExpression {
  @transient private lazy val as: Array[Long] = coeffs.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = coeffs.map(_._2).toArray
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.minhashSig(input.asInstanceOf[ArrayData], as, bs, prime)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", as, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bs, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleOps.minhashSig($c, $aRef, $bRef, ${prime}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Simhash60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash60"
  // Long.MinValue marks "no tokens" -> null (docs with no signal would
  // all collide on simhash 0; the builtin form dropped them via a
  // size(tokens) > 0 filter).
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val s = ShingleOps.simhash60(v.asInstanceOf[UTF8String])
      if (s == Long.MinValue) null else java.lang.Long.valueOf(s)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          long graftSim = graft.functions.ShingleOps.simhash60(${childGen.value});
          if (graftSim != Long.MIN_VALUE) {
            ${ev.isNull} = false;
            ${ev.value} = graftSim;
          }
        }
      """
    ev.copy(code = code)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class StringShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "string_shingles"
  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.stringShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.stringShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SortedInterMinExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_inter_min"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val v = ShingleOps.sortedInterMin(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (v == Long.MinValue) null else java.lang.Long.valueOf(v)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val code =
      code"""
        ${lGen.code}
        ${rGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${lGen.isNull} && !${rGen.isNull}) {
          long graftIm = graft.functions.ShingleOps.sortedInterMin(
            ${lGen.value}, ${rGen.value});
          if (graftIm != Long.MIN_VALUE) {
            ${ev.isNull} = false;
            ${ev.value} = graftIm;
          }
        }
      """
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

case class SortedInterCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_inter_count"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    ShingleOps.sortedInterCount(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ShingleOps.sortedInterCount($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

case class PhraseCountExpr(child: Expression, phrase: Seq[String])
    extends UnaryExpression {
  @transient private lazy val arr: Array[String] = phrase.toArray
  override def dataType: DataType = IntegerType
  override def prettyName: String = "phrase_count"
  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.phraseCount(input.asInstanceOf[UTF8String], arr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("phrase", arr, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleOps.phraseCount($c, $pRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

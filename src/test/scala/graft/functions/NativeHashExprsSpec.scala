package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential tests for the fused native expressions: each one must
  * be BIT-IDENTICAL to the builtin-composition form it replaced (the
  * same composition the DuckDB oracle SQL mirrors), across randomized
  * adversarial text — multi-space runs, tabs/newlines inside tokens,
  * unicode, leading/trailing spaces, short docs, empty and null text.
  */
class NativeHashExprsSpec extends SparkSpec {
  import spark.implicits._

  // ---- the original builtin-composition forms ------------------------------

  private def toks(text: Column): Column =
    filter(split(trim(text), " "), t => t =!= lit(""))

  private def builtinShingles(text: Column, n: Int): Column = {
    val t = toks(text)
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  private def builtinHashedShingles(text: Column, n: Int): Column =
    array_distinct(transform(
      array_distinct(builtinShingles(text, n)),
      sh => HashFunctions.stableHash64(sh)))

  private def builtinMinhash(hs: Column, k: Int): Column = {
    val bhs = transform(hs, h => h % graft.operators.Dedup.MinhashPrime)
    array(graft.operators.Dedup.minhashCoeffs(k).map { case (a, b) =>
      array_min(transform(bhs,
        h => (h * a + b) % graft.operators.Dedup.MinhashPrime))
    }: _*)
  }

  private def builtinSimhash(text: Column): Column = {
    val ths = transform(toks(text), t => HashFunctions.stableHash64(t))
    val bitSum = (0 until 60).map { b =>
      val sB = size(filter(ths,
        t => (shiftright(t, b).bitwiseAND(lit(1L))) === 1L)) * 2 - size(ths)
      when(sB > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    when(size(ths) > 0, bitSum)
  }

  private def builtinWinnow(text: Column, n: Int, w: Int): Column = {
    val hs = transform(builtinShingles(text, n),
      sh => HashFunctions.seededHash(0, sh))
    when(size(hs) > 0,
      array_distinct(transform(sequence(lit(1), size(hs)), i => {
        val start = greatest(i - (w - 1), lit(1))
        array_min(slice(hs, start, i - start + 1))
      }))).otherwise(array().cast("array<bigint>"))
  }

  // ---- randomized corpus ----------------------------------------------------

  private lazy val corpus: DataFrame = {
    val rnd = new scala.util.Random(20260812)
    val pieces = Array("alpha", "beta", "the", "x1", "a.b,c", "ß", "γλώσσα",
      "tab\tinside", "nl\ninside", "ALPHA", "ёж", "1", "--", "€")
    val rows = (0 until 400).map { id =>
      val n = rnd.nextInt(14)
      val seps = Array(" ", "  ", "   ")
      val sep = seps(rnd.nextInt(3))
      val body = Seq.fill(n)(pieces(rnd.nextInt(pieces.length)) +
        (if (rnd.nextBoolean()) rnd.nextInt(10).toString else ""))
        .mkString(sep)
      val text = (if (rnd.nextBoolean()) "  " else "") + body +
        (if (rnd.nextBoolean()) " " else "")
      (id.toLong, text)
    } :+ ((400L, "")) :+ ((401L, "   ")) :+ ((402L, "one two"))
    rows.toDF("doc_id", "text")
  }

  test("hashedShingles expression == builtin composition on random text") {
    val got = corpus.select(col("doc_id"),
      NativeHashExprs.hashedShingles(col("text"), 3).as("a"),
      builtinHashedShingles(col("text"), 3).as("b"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: native ${r.getSeq[Long](1)} != " +
          s"builtin ${r.getSeq[Long](2)}")
    }
  }

  test("minhashSig expression == builtin k-transform form") {
    val hs = corpus.select(col("doc_id"),
      NativeHashExprs.hashedShingles(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
    val got = hs.select(col("doc_id"),
      NativeHashExprs.minhashSig(col("hs"),
        graft.operators.Dedup.minhashCoeffs(16),
        graft.operators.Dedup.MinhashPrime).as("a"),
      builtinMinhash(col("hs"), 16).as("b"))
      .collect()
    got.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2),
      s"doc ${r.getLong(0)}"))
  }

  test("simhash60 expression == builtin bit-filter form (incl. null gate)") {
    val got = corpus.select(col("doc_id"),
      NativeHashExprs.simhash60(col("text")).as("a"),
      builtinSimhash(col("text")).as("b"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"doc ${r.getLong(0)} null gate")
      if (!r.isNullAt(1))
        assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)}")
    }
  }

  test("winnowFingerprints expression == builtin rolling-min form") {
    val got = corpus.select(col("doc_id"),
      NativeHashExprs.winnowFingerprints(col("text"), 3, 4).as("a"),
      builtinWinnow(col("text"), 3, 4).as("b"))
      .collect()
    got.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2),
      s"doc ${r.getLong(0)}"))
  }

  test("null text: expressions null out and the standard filters drop it") {
    val df = Seq((1L, Some("a b c d")), (2L, None))
      .toDF("doc_id", "text")
    assert(graft.operators.Dedup
      .hashedShingleArrays(df, "doc_id", "text", 3).count() == 1)
    assert(graft.operators.Dedup.simhash(df, "doc_id", "text").count() == 1)
    assert(graft.operators.TextAnalysis.fingerprints(df, "doc_id", "text")
      .select(col("doc_id")).distinct().count() == 1)
  }
}

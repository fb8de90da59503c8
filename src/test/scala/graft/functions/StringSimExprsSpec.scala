package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler: classic reference vectors, the DuckDB edge
  * conventions (empty strings, boost threshold), and the codegen'd
  * DataFrame path agreeing with the direct kernel.
  */
class StringSimExprsSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSimOps.jaroWinkler(UTF8String.fromString(a),
      UTF8String.fromString(b))

  test("kernel matches the classic reference vectors") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964)
      < 1e-12)
    assert(jw("abc", "abc") == 1.0)
  }

  test("DuckDB edge conventions: empty -> 0, boost only above 0.7 jaro") {
    assert(jw("", "") == 0.0)     // NOT 1.0 — pinned to the oracle
    assert(jw("a", "") == 0.0)
    assert(jw("a", "b") == 0.0)
    // "old bolt" vs "old gear": jaro = 2/3 <= 0.7, so NO prefix boost
    // despite the 4-char common prefix (the mismatch that a boost-
    // always variant produces: 0.8).
    assert(math.abs(jw("old bolt", "old gear") - 2.0 / 3.0) < 1e-12)
  }

  test("codegen'd column path equals the kernel") {
    val df = Seq(("martha", "marhta"), ("old bolt", "old gear"),
      ("", "")).toDF("a", "b")
    val got = df.select(StringSimExprs.jaroWinkler(col("a"), col("b")))
      .as[Double].collect().toSeq
    assert(got == Seq(jw("martha", "marhta"), jw("old bolt", "old gear"),
      0.0), s"got $got")
  }
}

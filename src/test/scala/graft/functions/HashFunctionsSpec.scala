package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Content-hash semantics of `/root/reference/utils.py:15-20`:
  * CRLF/CR -> LF, collapse whitespace runs to one space, trim, sha256.
  */
class HashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeText collapses whitespace exactly like the reference") {
    val cases = Seq(
      ("a\r\nb", "a b"),
      ("a\rb", "a b"),
      ("  a   b  ", "a b"),
      ("a\t\tb\nc", "a b c"),
      ("", ""),
      ("   ", ""),
      ("one", "one"))
    val got = cases.map(_._1).toDF("t")
      .select(HashFunctions.normalizeText(col("t"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("contentHash is idempotent under normalization (property)") {
    // Deterministic scalacheck generation: strings over a whitespace-heavy
    // alphabet, all checked in ONE vectorized Spark pass.
    val gen = Gen.listOfN(60,
      Gen.stringOfN(24, Gen.oneOf(('a' to 'f') ++ Seq(' ', '\t', '\r', '\n'))))
    val samples = gen.pureApply(Gen.Parameters.default, rng.Seed(42L))
    val df = samples.toDF("t")
      .select(
        HashFunctions.contentHash(col("t")).as("h1"),
        HashFunctions.contentHash(HashFunctions.normalizeText(col("t"))).as("h2"),
        HashFunctions.contentHash(concat(lit("  "), col("t"), lit("\r\n"))).as("h3"))
    val rows = df.collect()
    assert(rows.forall(r => r.getString(0) == r.getString(1)),
      "hash(normalize(x)) must equal hash(x)")
    assert(rows.forall(r => r.getString(0) == r.getString(2)),
      "leading/trailing whitespace must not change the hash")
  }

  test("mangled whitespace never changes the content hash") {
    val df = Seq("the quick brown fox", "a  b", "x").toDF("t")
      .select(
        HashFunctions.contentHash(col("t")).as("h1"),
        HashFunctions.contentHash(
          regexp_replace(col("t"), " ", "\r\n\t ")).as("h2"))
    assert(df.collect().forall(r => r.getString(0) == r.getString(1)))
  }

  test("stableHash64Local matches the column expression") {
    val inputs = Seq("hp:0:1", "hp:7:64", "0:some shingle", "", "abc")
    val fromSpark = inputs.toDF("s")
      .select(HashFunctions.stableHash64(col("s"))).as[Long].collect()
    val local = inputs.map(HashFunctions.stableHash64Local)
    assert(fromSpark.toSeq == local)
  }

  test("stableHash64 is non-negative and below 2^60") {
    val vals = (1 to 200).map(i => s"v$i").toDF("s")
      .select(HashFunctions.stableHash64(col("s"))).as[Long].collect()
    assert(vals.forall(v => v >= 0 && v < (1L << 60)))
  }
}

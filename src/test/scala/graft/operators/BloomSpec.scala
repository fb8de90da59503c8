package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom prefilter: no false negatives, exact semi-join equivalence. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("mightContain has no false negatives over the build keys") {
    val keys = spark.range(0, 500).select((col("id") * 7 + 3).as("k"))
    val words = Bloom.buildWords(keys, "k", mBits = 1 << 16, k = 5)
    val misses = keys
      .filter(!Bloom.mightContain(words, col("k"), 1 << 16, 5))
      .count()
    assert(misses == 0)
  }

  test("prefilter drops most non-members before the join") {
    val small = spark.range(0, 100).select((col("id") * 1000).as("k"))
    val words = Bloom.buildWords(small, "k", mBits = 1 << 16, k = 5)
    val big = spark.range(0, 20000).select(col("id").as("k"))
    val pass = big.filter(Bloom.mightContain(words, col("k"), 1 << 16, 5))
      .count()
    // 20 true members (k in 0,1000,...,19000); false positives must be
    // a sliver at 5 probes into 2^16 bits for 100 keys.
    assert(pass >= 20 && pass < 200, s"bloom passed $pass of 20000")
  }

  test("semiJoin equals the plain exact semi join") {
    val big = spark.range(0, 5000)
      .select(col("id").as("k"), (col("id") % 17).as("v"))
    val small = spark.range(0, 300).select((col("id") * 13).as("k"))
    val got = Bloom.semiJoin(big, small, "k").as[(Long, Long)]
      .collect().toSet
    val want = big.join(small.distinct(), Seq("k"), "left_semi")
      .as[(Long, Long)].collect().toSet
    assert(got == want)
  }
}

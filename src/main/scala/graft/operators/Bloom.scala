package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter JOIN PREFILTER — the explicit form of runtime row-level
  * filtering: build a small bit set over the join keys of the SMALL
  * side, ship it to every task as one literal, and drop the big side's
  * non-matching rows BEFORE the join's shuffle. At 100 TB the win is
  * exactly the rows that never travel: a semi join whose probe side is
  * 1% selective shuffles 1% of the big table instead of all of it,
  * at the cost of a scan-side codegen'd expression.
  *
  * False positives pass the filter and are removed by the exact join
  * that follows — results are identical to the plain join, so the SQL
  * oracle is just the semi join. Spark's own AQE bloom rewrite
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) makes the same
  * trade invisibly; this operator is for plans AQE won't rewrite
  * (non-equi follow-ons, unions, repeated reuse of one build).
  */
object Bloom {

  /** `k` bit positions in [0, mBits) for a key — xxhash64 seeded by the
    * probe index. Shared by build and probe so they can never drift.
    */
  private def positions(key: Column, mBits: Int, k: Int): Seq[Column] =
    (0 until k).map(j => pmod(xxhash64(lit(j), key), lit(mBits.toLong)))

  /** Build the filter over the small side's keys: one distributed pass
    * explodes each key's k bit positions, folds them into 64-bit words
    * map-side (`bit_or`), and collects mBits/64 longs — bounded by the
    * CONFIGURED filter size, never by the key count (2^20 bits = 16 K
    * longs ≈ 128 KB on the driver, whatever the build cardinality).
    */
  def buildWords(keys: DataFrame, keyCol: String, mBits: Int,
      k: Int): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64")
    require(k >= 1, s"k must be >= 1, got $k")
    val words = keys
      .select(explode(array(positions(col(keyCol), mBits, k): _*)).as("bit"))
      .select((col("bit") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("bit") % 64).cast("int"))
          .as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("mask"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** The probe predicate: all k bits of `key` set in `words`. */
  def mightContain(words: Array[Long], key: Column, mBits: Int,
      k: Int): Column = {
    val wordsLit = typedLit(words.toSeq)
    positions(key, mBits, k).map { bit =>
      call_function("shiftright",
        element_at(wordsLit, (bit / 64).cast("int") + 1),
        (bit % 64).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Exact semi join with the bloom prefilter on the big side: rows
    * failing the filter never reach the join's exchange; survivors
    * (matches + false positives) go through the exact semi join, so the
    * result equals `big.join(small, key, "left_semi")` bit-for-bit.
    */
  def semiJoin(big: DataFrame, small: DataFrame, keyCol: String,
      mBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    val words = buildWords(small.select(col(keyCol)).distinct(), keyCol,
      mBits, k)
    big.filter(mightContain(words, col(keyCol), mBits, k))
      .join(small.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
  }
}

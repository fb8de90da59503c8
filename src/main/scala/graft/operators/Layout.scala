package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT: Z-order (Morton) clustering, the
  * standard trick for making ONE physical sort serve range predicates
  * on TWO keys. Sorting 100 TB by `a` alone gives perfect file-level
  * min/max pruning on `a` and none on `b`; sorting by the interleaved
  * bits of both gives good (square-ish) pruning on each.
  *
  * The z-value is plain integer bit arithmetic — a codegen'd expression
  * here and the identical formula in SQL oracles.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of `a` (even positions) and
    * `b` (odd positions): z = sum_i (a_i << 2i | b_i << (2i+1)).
    * Callers bound their keys into [0, 2^bits) first.
    */
  def zorderValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** The same formula as DuckDB SQL over column names — generated from
    * one place so engine and oracle can never drift.
    */
  def zorderValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Physically cluster `df` by the z-order of two bounded integer
    * columns: range-partition on the z-value (so file k holds a
    * contiguous z-range — the pruning guarantee) and sort within each
    * partition. `parts` controls the output file count.
    */
  def zorderWrite(df: DataFrame, aCol: String, bCol: String, bits: Int,
      parts: Int, path: String): Unit =
    df.withColumn("__z", zorderValue(col(aCol), col(bCol), bits))
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}

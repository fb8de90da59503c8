package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, as codegen'd
  * builtin compositions (`zip_with` + `aggregate`) — no UDFs, no MLlib
  * vector conversions on the hot path.
  *
  * Everything is computed in double precision with a strict
  * left-to-right summation order so the DuckDB oracle
  * (`list_inner_product` over `DOUBLE[]`) produces bit-identical
  * results before rounding.
  */
object VectorFunctions {

  /** Cast array<float> -> array<double> (do this BEFORE multiplying:
    * float*float would round each product to float first).
    */
  def toDoubleArray(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-to-right sum of an array<double>. */
  def arraySum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x * y))

  /** L2 norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Per-vector symmetric int8 quantization scale: max|x| / 127
    * (0 for the all-zero vector). At 100 TB this is the ANN memory
    * lever — a 1024-dim float32 embedding is 4 KB; as (tinyint array,
    * one double scale) it is ~1 KB, 4x more vectors per executor and
    * per shuffle byte, while cosine ranking degrades only in the 4th
    * decimal (cosine is scale-invariant, so the stored scale matters
    * only for dot-product / L2 reconstruction).
    */
  def int8Scale(v: Column): Column =
    aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x))) / 127.0

  /** q_i = round(x_i / scale) as tinyint in [-127, 127]; the all-zero
    * vector (scale 0) quantizes to zeros.
    */
  def quantizeInt8(v: Column, scale: Column): Column =
    when(scale === 0.0, transform(v, _ => lit(0).cast("tinyint")))
      .otherwise(transform(v, x => round(x / scale).cast("tinyint")))

  /** Reconstructed double vector q_i * scale (what similarity math
    * runs on).
    */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** One 60-bit stable hash per token (`stableHash64("cv:" || token)`)
    * — the per-token randomness source for [[signedBowVector]],
    * computed ONCE per token so the per-dimension signs below read
    * bits instead of re-hashing. Identical in SQL as
    * `('0x' || substr(md5('cv:' || tok), 1, 15))::BIGINT`.
    */
  def tokenSignHashes(tokens: Column): Column =
    transform(tokens, t =>
      HashFunctions.stableHash64(concat(lit("cv:"), t)))

  /** Signed bag-of-words RANDOM PROJECTION of a token-hash array into
    * `dims` dimensions: dimension d sums, over the tokens WITH
    * multiplicity, +1 when bit d of the token's stable hash is set and
    * -1 otherwise — the classic SimHash-style dense featurization, the
    * deterministic stand-in for a learned text embedding that both
    * engines can compute bit-identically (every dimension is an exact
    * small integer, so the sum is order-free; SQL mirrors it as
    * `sum(CASE WHEN (h >> d) & 1 = 1 THEN 1 ELSE -1 END)::DOUBLE`).
    *
    * 100 TB shape: one md5 per token ([[tokenSignHashes]]) plus
    * `dims` in-row integer folds — a pure narrow projection, no
    * shuffle, no UDF, stays inside whole-stage codegen. `dims <= 60`
    * (the hash's usable bits).
    */
  def signedBowVector(hashes: Column, dims: Int): Column = {
    require(dims >= 1 && dims <= 60,
      s"signedBowVector dims must be in [1, 60], got $dims")
    array((0 until dims).map { d =>
      aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, d) % 2 === 1, 1L).otherwise(-1L))
        .cast("double")
    }: _*)
  }

  /** Driver-side twin of [[signedBowVector]] over a literal text (same
    * tokenizer contract as `TextFunctions.tokens`: trim, split on
    * whitespace runs, drop empties) — bit-identical values by
    * construction (integer sums of md5-bit signs). Lets a literal
    * query featurize at PLAN time, so probes carry the query vector as
    * a typed literal instead of a one-row joined frame (a constant
    * join key would fold into a nested-loop join).
    */
  def signedBowVectorLocal(text: String, dims: Int): Seq[Double] = {
    require(dims >= 1 && dims <= 60,
      s"signedBowVectorLocal dims must be in [1, 60], got $dims")
    val hs = text.trim.split("\\s+").filter(_.nonEmpty)
      .map(t => HashFunctions.stableHash64Local(s"cv:$t"))
    (0 until dims).map { d =>
      hs.map(h => if (((h >> d) & 1L) == 1L) 1L else -1L).sum.toDouble
    }
  }
}

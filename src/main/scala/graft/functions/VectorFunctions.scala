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
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Int8 quantization: per-component reconstruction error bounded by
  * scale/2, exact zero-vector handling, and cosine ranking stability
  * on deterministic pseudo-random vectors.
  */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  // 50 deterministic 16-dim vectors in [-1, 1] (md5-derived), plus the
  // all-zero vector.
  private lazy val vecs = spark.range(50).select($"id",
    transform(sequence(lit(0), lit(15)), i =>
      (conv(substring(md5(concat($"id", lit(":"), i)), 1, 8), 16, 10)
        .cast("long") % 2001 - 1000).cast("double") / 1000.0).as("v"))
    .unionByName(spark.range(50, 51).select($"id",
      transform(sequence(lit(0), lit(15)), _ => lit(0.0)).as("v")))

  test("quantizeInt8 bounds per-component error by scale/2") {
    val checked = vecs
      .withColumn("scale", VectorFunctions.int8Scale($"v"))
      .withColumn("back", VectorFunctions.dequantizeInt8(
        VectorFunctions.quantizeInt8($"v", $"scale"), $"scale"))
      .select($"id", $"scale",
        aggregate(zip_with($"v", $"back", (a, b) => abs(a - b)),
          lit(0.0), (m, x) => greatest(m, x)).as("max_err"),
        aggregate(VectorFunctions.quantizeInt8($"v", $"scale"),
          lit(0), (m, q) => greatest(m, abs(q.cast("int")))).as("max_q"))
      .as[(Long, Double, Double, Int)].collect()
    checked.foreach { case (id, scale, maxErr, maxQ) =>
      assert(maxErr <= scale / 2 + 1e-12, s"vec $id err $maxErr > ${scale / 2}")
      assert(maxQ <= 127, s"vec $id quantized magnitude $maxQ > 127")
    }
    // The zero vector has scale 0 and reconstructs exactly.
    val z = checked.find(_._1 == 50L).get
    assert(z._2 == 0.0 && z._3 == 0.0)
  }

  test("cosine over dequantized vectors stays within 0.01 of exact") {
    val deq = vecs.filter($"id" < 50)
      .withColumn("scale", VectorFunctions.int8Scale($"v"))
      .withColumn("dq", VectorFunctions.dequantizeInt8(
        VectorFunctions.quantizeInt8($"v", $"scale"), $"scale"))
    val pairs = deq.as("a").join(deq.as("b"), col("a.id") < col("b.id"))
      .select(
        VectorFunctions.cosine(col("a.v"), col("b.v")).as("exact"),
        VectorFunctions.cosine(col("a.dq"), col("b.dq")).as("approx"))
      .select(max(abs($"exact" - $"approx")).as("worst"))
      .as[Double].head()
    assert(pairs <= 0.01, s"worst cosine drift $pairs")
  }
}

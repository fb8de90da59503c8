package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** High-watermark incremental extraction. */
class IngestIncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("pulls strictly beyond the store's max bookmark") {
    val source = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 30L), (5L, 40L))
      .toDF("id", "mark")
    val store = source.filter(col("mark") <= 30)
    val got = Ingest.incrementalSince(store, source, "mark")
      .select("id").as[Long].collect().toSet
    // Rows AT the watermark (30) are already in the store — excluded.
    assert(got == Set(5L))
  }

  test("an empty store pulls everything") {
    val source = Seq((1L, 10L), (2L, 20L)).toDF("id", "mark")
    val empty = source.filter(lit(false))
    val got = Ingest.incrementalSince(empty, source, "mark")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }
}

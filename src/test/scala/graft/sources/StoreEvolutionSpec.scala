package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Additive schema evolution across store appends. */
class StoreEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("readEvolved unions schemas, null-fills the old files") {
    val path = java.nio.file.Files.createTempDirectory("graft-evolve")
      .toString + "/docs"
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(path)
    Seq((3L, "gamma", "en"), (4L, "delta", "de"))
      .toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(path)
    val got = Store.readEvolved(spark, path)
      .select(col("doc_id"), col("lang"))
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> None, 2L -> None,
      3L -> Some("en"), 4L -> Some("de")))
    // The plain reader keeps working (single-footer schema).
    assert(Store.read(spark, path).count() == 4)
  }
}

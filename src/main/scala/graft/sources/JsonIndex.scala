package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The filesystem JSON index (SURVEY S11/S15,
  * `/root/reference/storage/filesystem_store.py:48-70,201-211`): the
  * reference keeps per-site `pages_index.json` / `files_index.json`
  * arrays; the engine writes JSON Lines (the splittable form — a single
  * JSON array cannot be read in parallel at scale) and still reads the
  * reference's array layout via multiLine for migration.
  */
object JsonIndex {

  /** `PageRecord` index row (`/root/reference/models.py:43-57`). */
  val PageIndexSchema: StructType = StructType(Seq(
    StructField("page_id", StringType),
    StructField("job_id", StringType),
    StructField("url", StringType),
    StructField("domain", StringType),
    StructField("depth", IntegerType),
    StructField("text_path", StringType),
    StructField("content_type", StringType),
    StructField("content_hash", StringType),
    StructField("text_len", IntegerType)))

  /** S15: dump the index as JSON Lines. */
  def write(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").json(path)

  /** S11: schema-first read; corrupt rows dropped, mirroring the
    * reference's give-up-on-corrupt-index behavior
    * (`filesystem_store.py:56-63`) row-by-row instead of wholesale.
    */
  def read(spark: SparkSession, path: String,
      schema: StructType = PageIndexSchema): DataFrame =
    spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)

  /** Reads the reference's original array-of-objects index file. */
  def readLegacyArray(spark: SparkSession, path: String,
      schema: StructType = PageIndexSchema): DataFrame =
    spark.read.schema(schema).option("multiLine", true)
      .option("mode", "DROPMALFORMED").json(path)
}

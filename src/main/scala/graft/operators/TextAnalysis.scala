package graft.operators

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document fingerprinting (winnowing) — the rolling-hash scheme used for
  * plagiarism/near-dup detection: hash every word n-gram, slide a window
  * of `windowSize` consecutive shingle hashes, keep each window's min,
  * dedupe. A document pair sharing any fingerprint shares an n-gram run.
  *
  * Pure relational form: posexplode + window-min + distinct. The window
  * is per-document (partitioned), so at scale it parallelizes per doc
  * with no cross-document shuffle beyond the initial partition.
  */
object TextAnalysis {

  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, windowSize: Int = 4): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.shingles(col(textCol), n)).as(Seq("pos0", "sh")))
      .withColumn("pos", col("pos0") + 1)
      .withColumn("hv", HashFunctions.seededHash(0, col("sh")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(windowSize - 1), 0)
    sh.withColumn("fp", min(col("hv")).over(w))
      .select(col("doc_id"), col("fp"))
      .distinct()
  }
}

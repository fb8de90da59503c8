package graft.operators

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document fingerprinting (winnowing) — the rolling-hash scheme used for
  * plagiarism/near-dup detection: hash every word n-gram, slide a window
  * of `windowSize` consecutive shingle hashes, keep each window's min,
  * dedupe. A document pair sharing any fingerprint shares an n-gram run.
  *
  * Computed entirely in-row over the shingle-hash array (`transform` +
  * `slice` + `array_min`), then one explode of the distinct fingerprints.
  * No per-document window, no shuffle before the final distinct — at
  * scale every document fingerprints independently inside one
  * codegen'd projection.
  */
object TextAnalysis {

  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, windowSize: Int = 4): DataFrame = {
    val hashes = transform(TextFunctions.shingles(col(textCol), n),
      sh => HashFunctions.seededHash(0, sh))
    // fp[i] = min(hashes[max(1, i-w+1) .. i]), 1-based positions;
    // sequence(1, 0) would count DOWN, hence the empty-array guard.
    val fps = when(size(col("hs")) > 0,
      transform(sequence(lit(1), size(col("hs"))), i => {
        val start = greatest(i - (windowSize - 1), lit(1))
        array_min(slice(col("hs"), start, i - start + 1))
      })).otherwise(array().cast("array<bigint>"))
    docs
      .select(col(idCol).as("doc_id"), hashes.as("hs"))
      .select(col("doc_id"), explode(array_distinct(fps)).as("fp"))
  }
}

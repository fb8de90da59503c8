package graft.operators

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document fingerprinting (winnowing) — the rolling-hash scheme used for
  * plagiarism/near-dup detection: hash every word n-gram, slide a window
  * of `windowSize` consecutive shingle hashes, keep each window's min,
  * dedupe. A document pair sharing any fingerprint shares an n-gram run.
  *
  * Computed entirely in-row by the fused native expression
  * ([[graft.functions.NativeHashExprs.winnowFingerprints]] — one JVM
  * pass per document; bit-identical to the earlier `transform` +
  * `slice` + `array_min` builtin chain, which ran interpreted), then
  * one explode of the distinct fingerprints. No per-document window
  * shuffle — at scale every document fingerprints independently inside
  * one codegen'd projection.
  */
object TextAnalysis {

  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, windowSize: Int = 4): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.NativeHashExprs.winnowFingerprints(
          col(textCol), n, windowSize).as("fps"))
      .select(col("doc_id"), explode(col("fps")).as("fp"))
}

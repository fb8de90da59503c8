package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max}

/** Commit-marker ledger shared by the GENERATIONAL parquet stores (the
  * inverted index, the ANN store): an append writes its parquet slices
  * tagged with a fresh batch id and then creates the empty marker file
  * `<dir>/_commits/b<batch>` as its LAST step — the linearization
  * point. Readers only ever see committed batches, so a crash between
  * the slice writes and the marker leaves orphan rows that are
  * invisible forever; the next delivery allocates a fresh id above
  * every id PRESENT in the data (committed or orphaned — that is why
  * [[nextBatchId]] reads the raw parquet, not the ledger), so
  * at-least-once redelivery can never double a row under an id a
  * reader will trust. Single-writer ingest assumed (the streaming
  * sinks are serial foreachBatch).
  *
  * `_commits` is underscore-prefixed, so Spark's parquet reader ignores
  * it — the ledger can live INSIDE a parquet directory (the ANN store)
  * or beside table subdirectories (the inverted index).
  */
object Commits {

  /** Batch ids whose commit marker exists (the readable generations). */
  def committed(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_commits")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName).filter(_.startsWith("b"))
      .map(_.drop(1).toLong)
  }

  /** Create the marker — the append's atomic commit point. */
  def commit(spark: SparkSession, dir: String, batch: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_commits/b$batch")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  /** Drop the whole ledger (vacuum/rebuild resets to batch 0). */
  def clear(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_commits")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }

  /** Next unused batch id: max `batch` present in the parquet data at
    * `dataPath` — orphans from crashed appends included, that is the
    * point — plus one; 0 for a store that does not exist yet.
    */
  def nextBatchId(spark: SparkSession, dataPath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dataPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else spark.read.parquet(dataPath)
      .agg(max(col("batch"))).head().getLong(0) + 1L
  }
}

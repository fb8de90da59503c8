package graft.pipeline

import graft.functions.HashFunctions
import graft.operators.Upsert
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch re-ingest (SURVEY §3.3,
  * `/root/reference/workers/raw_to_postgres.py:5-30`): join the JSON
  * index rows to their text blobs by path (J8/S12), content-hash, and
  * insert-if-absent by content into the target table (A8 — dedup by
  * CONTENT, not by source id, matching the reference's
  * `ON CONFLICT (content_hash) DO NOTHING` path).
  *
  * Pure 3-operator batch plan: one equi-join on the blob path, one
  * in-batch dedup, one anti-join against existing hashes. At scale the
  * blob side is the big one — the join shuffles on path; the target
  * anti-join shuffles on the 64-hex hash.
  */
object Ingest {

  /** HIGH-WATERMARK incremental extraction — the bookmark pattern every
    * scheduled integration run uses: read the store's max `bookmarkCol`
    * (one driver-side scalar from a 1-row aggregate — at scale this
    * comes from table statistics, same contract) and pull only source
    * rows strictly beyond it. The comparison is a plain column
    * predicate, so it pushes down to the source scan (parquet min/max
    * skipping, JDBC WHERE). An empty store pulls everything.
    */
  def incrementalSince(store: DataFrame, source: DataFrame,
      bookmarkCol: String): DataFrame = {
    val mx = store.agg(max(col(bookmarkCol))).head.get(0)
    if (mx == null) source
    else source.filter(col(bookmarkCol) > lit(mx))
  }

  /** `index`: rows carrying `text_path` + metadata; `blobs`:
    * (text_path, text); `target`: existing rows with `content_hash`.
    * Returns the index rows (with text + hash) that are genuinely new
    * by content, lowest `idCol` winning within the batch.
    */
  def reingest(index: DataFrame, blobs: DataFrame, target: DataFrame,
      idCol: String): DataFrame = {
    val batch = index
      .join(blobs, Seq("text_path"))
      .withColumn("content_hash", HashFunctions.contentHash(col("text")))
    Upsert.insertIfAbsent(target, batch, idCol)
  }

  /** The full `raw_to_postgres` loop
    * (`/root/reference/workers/raw_to_postgres.py:5-30`): index joined
    * to blobs, content-hashed, then insert-if-absent straight into the
    * relational table through the JDBC leg — the table is created on
    * first run, and re-delivering the same index/blobs inserts nothing.
    */
  def reingestToJdbc(index: DataFrame, blobs: DataFrame, url: String,
      table: String, idCol: String,
      options: Map[String, String] = Map.empty): Unit = {
    val batch = index
      .join(blobs, Seq("text_path"))
      .withColumn("content_hash", HashFunctions.contentHash(col("text")))
    graft.streaming.Streams.jdbcInsertIfAbsentBatch(
      batch, url, table, idCol, options)
  }
}

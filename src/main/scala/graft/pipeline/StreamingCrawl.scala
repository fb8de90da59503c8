package graft.pipeline

import graft.functions.{HashFunctions, UrlFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** ST2 — the frontier as a STREAM: the crawl loop re-expressed as a
  * self-feeding Structured Streaming pipeline, the engine's analog of
  * the reference's asyncio frontier queue + worker fan-out
  * (`/root/reference/crawler/crawler_core.py:149-271`).
  *
  *   - the frontier is a JSON-lines directory consumed by a file-source
  *     stream; each micro-batch is one crawl round (`Crawl.round`);
  *   - discovered page links are appended BACK into the frontier
  *     directory, which the source picks up as the next trigger — the
  *     queue feeds itself until no new links appear (the
  *     `queue.join()` completion of `crawler_core.py:271`);
  *   - visited/processed-file state lives in parquet directories,
  *     anti-joined per batch (J1-J3) — bounded, replayable, no driver
  *     collections;
  *   - pages/files append to parquet sinks; checkpointing makes the
  *     whole loop restartable mid-crawl (ST8).
  *
  * Like the reference's FIFO queue, ordering is approximately-BFS: a
  * url reached by two paths keeps its first-arrival depth.
  */
object StreamingCrawl {

  final case class Dirs(frontier: String, pages: String, files: String,
      state: String, checkpoint: String)

  val FrontierSchema: StructType = StructType(Seq(
    StructField("url", StringType), StructField("depth", IntegerType)))

  /** Enqueue seed urls (defragmented, depth 0). */
  def seed(spark: SparkSession, dirs: Dirs, urls: Seq[String]): Unit = {
    import spark.implicits._
    urls.toDF("raw")
      .select(UrlFunctions.defragment(col("raw")).as("url"),
        lit(0).as("depth"))
      .distinct()
      .write.mode("append").json(dirs.frontier)
  }

  private def state(spark: SparkSession, path: String): DataFrame =
    if (new java.io.File(path).exists()) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("url", StringType))))

  def start(spark: SparkSession, fetcher: Fetcher, dirs: Dirs,
      cfg: CrawlConfig): StreamingQuery = {
    Crawl.ensureCheckpointDir(spark)
    spark.readStream.schema(FrontierSchema).json(dirs.frontier)
      .writeStream
      .option("checkpointLocation", dirs.checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, fetcher, dirs, cfg, batch)
      }
      .start()
  }

  /** One micro-batch = one crawl round over the not-yet-visited slice
    * of the incoming frontier rows.
    */
  private def processBatch(spark: SparkSession, fetcher: Fetcher,
      dirs: Dirs, cfg: CrawlConfig, batch: DataFrame): Unit = {
    val visited = state(spark, s"${dirs.state}/visited")
    // Pinned (base-dir) checkpoint: this runs on the streaming
    // micro-batch thread, possibly concurrent with a Rotating loop —
    // never checkpoint into a directory that could be rotated away.
    val frontier = graft.Checkpoints.pinned(batch
      .filter(col("depth") <= cfg.depthCap)
      .groupBy(col("url")).agg(min(col("depth")).as("depth"))
      .join(visited, Seq("url"), "left_anti"))
    if (!frontier.isEmpty) {
      // Claim before expanding: later batches must not re-crawl.
      frontier.select("url").write.mode("append")
        .parquet(s"${dirs.state}/visited")

      val out = Crawl.round(fetcher, frontier,
        state(spark, s"${dirs.state}/visited_files"), cfg)
      out.pages
        .withColumn("content_hash", HashFunctions.contentHash(col("text")))
        .write.mode("append").parquet(dirs.pages)
      if (!out.files.isEmpty) {
        out.files
          .withColumn("content_hash", HashFunctions.contentHash(col("text")))
          .write.mode("append").parquet(dirs.files)
        out.files.select("url").write.mode("append")
          .parquet(s"${dirs.state}/visited_files")
      }

      // Self-feed: new links become the next trigger's input.
      val next = out.pageLinks
        .filter(col("depth") <= cfg.depthCap)
        .groupBy(col("url")).agg(min(col("depth")).as("depth"))
        .join(state(spark, s"${dirs.state}/visited"), Seq("url"), "left_anti")
      if (!cfg.singlePage && !next.isEmpty)
        next.write.mode("append").json(dirs.frontier)
    }
  }
}

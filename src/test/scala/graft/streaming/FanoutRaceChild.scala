package graft.streaming

/** Forked by CrossJvmFanoutSpec: a REAL second JVM attempting the full
  * composed fan-out ([[Streams.fanoutIngestBatchNeardupGated]], six
  * surfaces) against a store family the parent test JVM partially
  * holds. The in-process FanoutIngestSpec covers composition
  * semantics; only a forked JVM can pin that a CONCURRENT second
  * fan-out writer is refused by the per-store writer lease
  * mid-composition — after some of its surfaces already committed —
  * and that the abort leaves no stuck lease behind.
  *
  * Protocol: args = (root, batchId). Ingests the fixed WaveB batch
  * against the family under `root`. Success prints `DONE <counts>`
  * and exits 0; a lease refusal (IllegalStateException from any
  * component store's withWriterLock) prints `REFUSED <store>` and
  * exits 2.
  */
object FanoutRaceChild {

  /** The batch both the child attempt and the parent's redelivery
    * ingest — texts are span/shingle-disjoint from CrossJvmFanoutSpec's
    * WaveA so every doc survives both dedup gates.
    */
  def waveB(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    val rows = Seq(
      (5L, "quick brown fox jumps high", Seq(0.9f, 0.1f, 0.0f)),
      (6L, "lazy dog sleeps under porch", Seq(0.1f, 0.9f, 0.0f)),
      (7L, "river bends around granite cliffs", Seq(0.0f, 0.1f, 0.9f)))
    spark.createDataFrame(rows).toDF("doc_id", "text", "vec")
  }

  def ingest(spark: org.apache.spark.sql.SparkSession, root: String,
      batchId: Long): (Long, Long, Long, Long, Long, Long, Long) =
    Streams.fanoutIngestBatchNeardupGated(waveB(spark), batchId,
      s"$root/store", s"$root/index", s"$root/ann", s"$root/gram",
      s"$root/nd", "doc_id", "text", vecCol = Some("vec"),
      planes = 4, dims = 3, k = 3, pqDir = Some(s"$root/pq"),
      pqM = 3, pqCodes = 2)

  def main(args: Array[String]): Unit = {
    val Array(root, batchId) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-fanout-race-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val code =
      try {
        val counts = ingest(spark, root, batchId.toLong)
        println(s"DONE $counts")
        Console.flush()
        0
      } catch {
        case e: IllegalStateException =>
          println(s"REFUSED ${e.getMessage}")
          Console.flush()
          2
      }
    spark.stop()
    sys.exit(code)
  }
}

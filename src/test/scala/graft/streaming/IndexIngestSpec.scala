package graft.streaming

import graft.SparkSpec
import graft.operators.Search
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming inverted-index ingest: micro-batches land insert-if-absent
  * in the standing postings store; a BM25 probe over the store matches
  * the batch answer over the same docs.
  */
class IndexIngestSpec extends SparkSpec {
  import spark.implicits._

  test("indexIngestSink feeds the standing index through foreachBatch") {
    val dir = java.nio.file.Files.createTempDirectory("sidx").toString + "/idx"
    val ckpt = java.nio.file.Files.createTempDirectory("sidx-ckpt").toString
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Streams.indexIngestSink(in.toDF().toDF("doc_id", "text"),
      "doc_id", "text", dir, ckpt)
    in.addData((1L, "spark engine spark"), (2L, "vector index"))
    in.addData((3L, "spark row"), (1L, "spark engine spark"))  // dup id later
    try q.processAllAvailable() finally q.stop()
    // Membership has no duplicate for doc 1.
    val ids = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir/docs")
      .select("doc_id").as[Long].collect().toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L))
    // The store probe equals the batch answer over the same corpus.
    val batch = Seq((1L, "spark engine spark"), (2L, "vector index"),
      (3L, "spark row")).toDF("doc_id", "text")
    val want = Search.bm25TopK(batch, "doc_id", "text", Seq("spark"), 10)
      .collect().toSeq
    val got = Search.bm25FromIndexTopK(spark, dir, Seq("spark"), 10)
      .collect().toSeq
    assert(got == want)
  }
}

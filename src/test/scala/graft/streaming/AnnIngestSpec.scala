package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The standing ANN store: append-only int8+bucket index fed by a
  * stream, insert-if-absent convergence under re-delivery, and query
  * recall through the bucket-pruned path.
  */
class AnnIngestSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16

  /** Deterministic unit-ish vector seeded per id. */
  private def vec(seed: Int): Seq[Float] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(dims)(rnd.nextFloat() * 2 - 1)
  }
  /** A slightly perturbed copy — same bucket with high probability,
    * near-1 cosine.
    */
  private def near(v: Seq[Float]): Seq[Float] = v.map(x => x * 0.95f + 0.01f)

  test("annStoreAppend is insert-if-absent; annStoreTopK finds the near copy") {
    val dir = java.nio.file.Files.createTempDirectory("ann").toString + "/idx"
    val v1 = vec(1)
    val base = (2 to 40).map(i => (i.toLong, vec(i))) :+ (1L, v1)
    assert(Similarity.annStoreAppend(
      base.toDF("id", "vec"), dir, planes = 4, dims = dims) == 40)
    // Re-delivery of the same batch inserts nothing.
    assert(Similarity.annStoreAppend(
      base.toDF("id", "vec"), dir, planes = 4, dims = dims) == 0)
    // A later batch adds the near-copy of id 1 (fresh id).
    assert(Similarity.annStoreAppend(
      Seq((100L, near(v1))).toDF("id", "vec"), dir, 4, dims) == 1)

    // Query with id 1's exact vector: its stored near-copy must be the
    // top hit (cosine(v, 0.95v + eps) ~ 1, int8 error can't flip it).
    val got = Similarity.annStoreTopK(spark, dir,
      Seq((1L, v1)).toDF("id", "vec"), planes = 4, dims = dims, k = 1)
      .select("qid", "cid", "score").as[(Long, Long, Double)].collect()
    assert(got.length == 1 && got.head._1 == 1L && got.head._2 == 100L)
    assert(got.head._3 > 0.99)
  }

  test("annStoreAppend upserts a re-embedded id; the old vector stops matching") {
    val dir = java.nio.file.Files.createTempDirectory("ann-up").toString + "/idx"
    val v1 = vec(1)
    val v1b = vec(101)  // completely different embedding for the same id
    val base = (1 to 30).map(i => (i.toLong, vec(i)))
    assert(Similarity.annStoreAppend(
      base.toDF("id", "vec"), dir, planes = 4, dims = dims) == 30)
    // Re-embedding id 1 writes exactly one updated row...
    assert(Similarity.annStoreAppend(
      Seq((1L, v1b)).toDF("id", "vec"), dir, 4, dims) == 1)
    // ...and redelivering the update is a no-op.
    assert(Similarity.annStoreAppend(
      Seq((1L, v1b)).toDF("id", "vec"), dir, 4, dims) == 0)
    // A near-copy probe of the NEW embedding finds id 1; a probe of the
    // OLD embedding must not (its row is superseded).
    def top(q: Seq[Float]) = Similarity.annStoreTopK(spark, dir,
      Seq((999L, q)).toDF("id", "vec"), planes = 4, dims = dims, k = 1)
      .select("cid", "score").as[(Long, Double)].collect().toSeq
    val hitNew = top(near(v1b))
    assert(hitNew.nonEmpty && hitNew.head._1 == 1L && hitNew.head._2 > 0.99)
    val hitOld = top(near(v1))
    assert(hitOld.isEmpty || hitOld.head._1 != 1L || hitOld.head._2 < 0.99,
      s"superseded vector still matching: $hitOld")
    // Vacuum compacts to one row per id and preserves answers.
    Similarity.annStoreVacuum(spark, dir)
    val rows = spark.read.option("recursiveFileLookup", "true")
      .parquet(dir)
    assert(rows.count() == 30 &&
      rows.select("id").distinct().count() == 30)
    assert(top(near(v1b)).head._1 == 1L)
  }

  test("annStoreDelete tombstones ids out of probes; re-append resurrects") {
    val dir = java.nio.file.Files.createTempDirectory("ann-del").toString + "/idx"
    val base = (1 to 20).map(i => (i.toLong, vec(i)))
    assert(Similarity.annStoreAppend(
      base.toDF("id", "vec"), dir, planes = 4, dims = dims) == 20)
    def top(q: Seq[Float]) = Similarity.annStoreTopK(spark, dir,
      Seq((999L, q)).toDF("id", "vec"), planes = 4, dims = dims, k = 1)
      .select("cid").as[Long].collect().toSeq
    assert(top(near(vec(7))) == Seq(7L))
    // Delete id 7 (absent id 500 is a no-op), idempotently.
    assert(Similarity.annStoreDelete(spark, dir,
      Seq(7L, 500L).toDF("id")) == 1L)
    assert(Similarity.annStoreDelete(spark, dir, Seq(7L).toDF("id")) == 0L)
    assert(!top(near(vec(7))).contains(7L))
    // Re-append resurrects, vacuum keeps the live answer.
    assert(Similarity.annStoreAppend(
      Seq((7L, vec(7))).toDF("id", "vec"), dir, 4, dims) == 1)
    assert(top(near(vec(7))) == Seq(7L))
    Similarity.annStoreVacuum(spark, dir)
    assert(spark.read.option("recursiveFileLookup", "true")
      .parquet(dir).count() == 20)
    assert(top(near(vec(7))) == Seq(7L))
  }

  test("pqIngestSink streams batches into a built PQ store") {
    val dir = java.nio.file.Files.createTempDirectory("pq").toString + "/st"
    val ckpt = java.nio.file.Files.createTempDirectory("pq-ckpt").toString
    // Train-once build; the stream then only encodes with the stored
    // codebook.
    assert(Similarity.pqStoreBuild(
      (1 to 8).map(i => (i.toLong, vec(i))).toDF("id", "vec"),
      dir, m = 2, subDims = 8, codes = 4, iters = 2) == 8)
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val q = Streams.pqIngestSink(in.toDF().toDF("id", "vec"), dir, ckpt)
    in.addData((20L, vec(20)), (21L, vec(21)))
    in.addData((20L, vec(20)), (22L, vec(22)))  // dup delivery of 20
    try q.processAllAvailable() finally q.stop()
    val ids = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir/rows").select("id").as[Long].collect().toSeq
    assert(ids.size == 11 && ids.count(_ == 20L) == 1,
      s"expected 11 unique-current rows, got $ids")
    // The streamed vectors are probe-visible.
    val top = Similarity.pqStoreTopK(spark,
        dir, Seq((20L, vec(20))).toDF("id", "vec"), k = 1)
      .select("cid").as[Long].collect()
    assert(top.length == 1)
  }

  test("annIngestSink feeds the store through foreachBatch") {
    val dir = java.nio.file.Files.createTempDirectory("ann").toString + "/idx"
    val ckpt = java.nio.file.Files.createTempDirectory("ann-ckpt").toString
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val q = Streams.annIngestSink(in.toDF().toDF("id", "vec"), dir,
      planes = 4, dims = dims, checkpointDir = ckpt)
    in.addData((1L, vec(1)), (2L, vec(2)))
    in.addData((3L, vec(3)), (1L, vec(1)))   // dup id in later batch
    try q.processAllAvailable() finally q.stop()
    val ids = spark.read.option("recursiveFileLookup", "true")
      .parquet(dir).select("id").as[Long].collect().toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L))    // no duplicate row for id 1
  }
}

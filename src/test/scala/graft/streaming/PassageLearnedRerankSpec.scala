package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The learned second-stage passage rerank: a closed-form least-squares
  * fit over the candidate half, applied in exact integer algebra. The
  * spec pins the contract the oracle can't see from one fixture: the
  * output invariants (ranks are a 1-based prefix, docs fold by their
  * best learned rank), determinism across runs, and the det = 0
  * degenerate-training fallback to the ADC order.
  */
class PassageLearnedRerankSpec extends SparkSpec {
  import spark.implicits._

  private def buildStore(docs: Seq[(Long, String)]): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("plearn").toString
    val (ck, vec) = (s"$root/chunks", s"$root/vec")
    val df = docs.toDF("doc_id", "text")
    Streams.chunkIngestBatch(df, ck, "doc_id", "text",
      window = 4, overlap = 1)
    assert(Streams.chunkVectorIngestBatch(spark, ck, vec,
      df.select(col("doc_id")), dims = 8, m = 2, codes = 2, cells = 2) > 0)
    (ck, vec)
  }

  test("ranks are a 1-based prefix and docs fold by best learned rank") {
    val docs = (1L to 12L).map { i =>
      (i, s"alpha beta gamma_$i delta_$i epsilon_$i zeta_$i eta_$i " +
        s"theta_$i iota kappa lambda_$i mu_$i")
    }
    val (ck, vec) = buildStore(docs)
    val out = Streams.passageLearnedRerankTopK(spark, ck, vec,
        "alpha iota kappa", dims = 8, kCand = 30, kPassages = 10,
        kDocs = 5, nprobe = 0)
      .orderBy(col("rnk")).collect()
    assert(out.nonEmpty && out.length <= 5)
    assert(out.map(_.getAs[Int]("rnk")).toSeq == (1 to out.length))
    val bests = out.map(_.getAs[Long]("best_rank"))
    assert(bests.forall(_ >= 1L), s"ranks must be 1-based: ${bests.toSeq}")
    assert(bests.sameElements(bests.sorted),
      s"docs must order by best learned rank: ${bests.toSeq}")
    // Deterministic: a second probe returns the identical frame.
    val again = Streams.passageLearnedRerankTopK(spark, ck, vec,
        "alpha iota kappa", dims = 8, kCand = 30, kPassages = 10,
        kDocs = 5, nprobe = 0)
      .orderBy(col("rnk")).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("degenerate training (det = 0) falls back to the ADC order") {
    // Every doc is the same single window -> every candidate carries
    // the identical (x1, x2), the normal equations are singular, and
    // the learned order must equal the exact-rerank/ADC order rather
    // than throw or emit an arbitrary permutation.
    val docs = (1L to 6L).map(i => (i, "alpha beta gamma delta"))
    val (ck, vec) = buildStore(docs)
    val learned = Streams.passageLearnedRerankTopK(spark, ck, vec,
        "alpha beta", dims = 8, kCand = 6, kPassages = 6, kDocs = 6,
        nprobe = 0)
      .orderBy(col("rnk"))
      .select(col("doc_id")).as[Long].collect().toSeq
    val adc = Streams.passageTopK(spark, vec, "alpha beta", dims = 8,
        kPassages = 6, kDocs = 6, nprobe = 0)
      .orderBy(col("rnk"))
      .select(col("doc_id")).as[Long].collect().toSeq
    assert(learned == adc,
      s"det=0 fallback must match the ADC order: $learned vs $adc")
  }
}

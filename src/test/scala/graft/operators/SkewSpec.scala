package graft.operators

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Skew-resilience smoke test: the 100 TB claim for the dedup/ANN
  * family rests on banded blocking keeping any single task's INPUT
  * bounded even when a hot near-dup cluster puts many docs in one LSH
  * bucket. This drives dd_minhash / dd_simhash / sim_lsh shapes over a
  * synthetic corpus where 1% of docs are IDENTICAL (the worst case:
  * they share every band bucket) at 256 shuffle partitions, and asserts
  * via task metrics that no shuffle task reads more than 10x the median
  * of its stage. Pair EXPLOSION from a hot bucket is join output, not
  * task input — the invariant here is that the hot key never
  * concentrates the corpus into one reader.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  /** Per-stage task input sizes (file input + shuffle read bytes). */
  private final class TaskInputListener extends SparkListener {
    val stages =
      scala.collection.concurrent.TrieMap[Int, List[Long]]()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        val in = m.inputMetrics.bytesRead +
          m.shuffleReadMetrics.totalBytesRead
        stages.updateWith(e.stageId) {
          case Some(l) => Some(in :: l)
          case None => Some(List(in))
        }
      }
    }
  }

  private def assertBoundedSkew(listener: TaskInputListener,
      label: String): Unit = {
    // Let the listener bus drain: poll until task counts stop moving.
    var last = -1
    var same = 0
    while (same < 3) {
      Thread.sleep(100)
      val now = listener.stages.values.map(_.size).sum
      if (now == last) same += 1 else { same = 0; last = now }
    }
    val checked = listener.stages.toSeq.flatMap { case (stageId, inputs) =>
      // Only shuffle-sized stages with real data: 256-partition stages
      // where at least 32 tasks read something (a tiny or local stage
      // has nothing to say about skew).
      val nonzero = inputs.filter(_ > 0).sorted
      if (inputs.size >= 64 && nonzero.size >= 32) {
        val median = nonzero(nonzero.size / 2)
        val max = nonzero.last
        assert(max <= 10L * median,
          s"$label stage $stageId: max task input $max > 10x median " +
            s"$median over ${nonzero.size} tasks — hot bucket skew")
        Some(stageId)
      } else None
    }
    assert(checked.nonEmpty,
      s"$label: no shuffle stage was large enough to check — test is vacuous")
  }

  private def withListener(label: String)(body: => Unit): Unit = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    val listener = new TaskInputListener
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      assertBoundedSkew(listener, label)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.shuffle.partitions", old)
    }
  }

  // 5000 docs of ~40 tokens from a 3000-word vocab; ids 0..49 (1%) are
  // ONE identical hot document — they share every MinHash band bucket,
  // the same simhash, and the same text shingles.
  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    val vocab = Array.tabulate(3000)(i => s"w$i")
    val hot = "the quick brown corpus " +
      Array.fill(36)(vocab(rnd.nextInt(3000))).mkString(" ")
    (0 until 5000).map { id =>
      val text =
        if (id < 50) hot
        else Array.fill(40)(vocab(rnd.nextInt(3000))).mkString(" ")
      (id.toLong, text)
    }.toDF("doc_id", "text").repartition(64)
  }

  test("dd_minhash: a 1% identical hot cluster keeps task inputs bounded") {
    withListener("minhash-lsh") {
      val hs = Dedup.hashedShingleArrays(corpus, "doc_id", "text", 3)
      val cand = Dedup.lshCandidatePairs(
        Dedup.lshBands(Dedup.minhashSignatures(hs, 128), 128, 16))
      // 50 identical docs -> 50*49/2 pairs from the hot cluster alone.
      assert(cand.count() >= 1225L)
    }
  }

  test("dd_simhash: a 1% identical hot cluster keeps task inputs bounded") {
    withListener("simhash") {
      val pairs = Dedup.simhashPairs(
        Dedup.simhash(corpus, "doc_id", "text"), maxHamming = 8, bands = 4)
      assert(pairs.count() >= 1225L)
    }
  }

  test("saltedAgg: a 50% hot key keeps reducer inputs bounded") {
    withListener("salted-agg") {
      // Half the rows carry ONE key — the AQE-immune shape saltedAgg
      // exists for (collect-style state, no map-side shrink of the hot
      // key's row volume). Values are low-cardinality so the MERGE
      // stage is also bounded: each (key, salt) partial is a <=50-set,
      // and the hot key's 64 partials stay comparable to a cold key's.
      val rows = (0 until 200000).map { i =>
        val k = if (i % 2 == 0) "hot" else s"k${i % 128}"
        (k, s"v${(i / 2) % 50}")
      }.toDF("key", "value").repartition(64)
      val out = Salt.saltedAgg(rows, "key", salts = 64)(
        partial = Seq(collect_set(col("value")).as("vs"),
          count(lit(1)).as("pn")),
        merge = Seq(sum(col("pn")).as("n"),
          size(array_distinct(flatten(collect_list(col("vs")))))
            .as("n_distinct")))
      val hot = out.filter(col("key") === "hot")
        .select("n", "n_distinct").as[(Long, Int)].collect()
      assert(hot.toSeq == Seq((100000L, 50)))
    }
  }

  test("sim_lsh: duplicated embeddings keep task inputs bounded") {
    withListener("sim-lsh") {
      val rnd = new scala.util.Random(11)
      val hot = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val vecs = (0 until 4000).map { id =>
        val v =
          if (id < 40) hot
          else Array.fill(64)(rnd.nextFloat() * 2 - 1)
        (id.toLong, v.toSeq)
      }.toDF("id", "vec").repartition(64)
      val out = Similarity.lshTopK(vecs,
        vecs.select(col("id")).filter(col("id") < 20),
        planes = 8, dims = 64, k = 3)
      assert(out.count() > 0L)
    }
  }
}

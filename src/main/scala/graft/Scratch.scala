package graft

import org.apache.spark.sql.SparkSession

/** Throwaway perf probe (not part of the driver contract): runs the
  * queries named in args repeatedly and prints per-run seconds.
  * Cache is cleared between runs, matching the Bench protocol.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[scratch] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }

  /** Stage-by-stage probe of the shingle->minhash pipeline. */
  def stages(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 1000000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+", "zzz").as("text")))
    def time(label: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"[stage] $label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("corpus")(corpus.write.format("noop").mode("overwrite").save())
    val sh = operators.Dedup.shingleArrays(corpus, "doc_id", "text", 3)
    time("shingleArrays")(sh.write.format("noop").mode("overwrite").save())
    val hs = operators.Dedup.hashedShingleArrays(corpus, "doc_id", "text", 3)
    time("hashedShingles")(hs.write.format("noop").mode("overwrite").save())
    val sig = operators.Dedup.minhashSignatures(hs, 128)
    time("signatures")(sig.write.format("noop").mode("overwrite").save())
    val bands = operators.Dedup.lshBands(sig, 128, 16)
    time("bands")(bands.write.format("noop").mode("overwrite").save())
    val cand = operators.Dedup.lshCandidatePairs(bands)
    time("cand")(cand.write.format("noop").mode("overwrite").save())
    // Jaccard-blocking branch.
    val hsP = hs.persist()
    hsP.write.format("noop").mode("overwrite").save()
    val exploded = hsP.select(col("doc_id"), explode(col("hs")).as("bh"))
    time("exploded")(exploded.write.format("noop").mode("overwrite").save())
    val blocked = operators.Dedup.shingleBlockedPairs(exploded, 20)
    time("blockedPairs")(blocked.write.format("noop").mode("overwrite").save())
    val jac = operators.Dedup.jaccard(blocked, hsP)
    time("jaccard")(jac.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

object ScratchStages {
  def main(args: Array[String]): Unit = Scratch.stages()
}

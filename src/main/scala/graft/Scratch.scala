package graft

import org.apache.spark.sql.SparkSession

/** Throwaway perf probe (not part of the driver contract): runs the
  * queries named in args repeatedly and prints per-run seconds.
  * Cache is cleared between runs, matching the Bench protocol.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_SCRATCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      // Same codegen-class cache sizing as Bench: quiet floors must be
      // measured under the engine config the bench runs.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Floor logs are only meaningful at the scale they were measured
    // at; tools/total_floors.py refuses logs whose sf mismatches the
    // reference (the repin tool's sf guard did not cover floors).
    println(s"[scratch] sf $sfDir")
    args.foreach { name =>
      val secs = (1 to nRuns).map { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scratch] $name run$i $sec%.2f s")
        spark.catalog.clearCache()
        sec
      }
      // Floor convention mirrors warm_pins.py: run1 pays the query's
      // own code-path JIT; runs 2..N are the reproducible quiet floor.
      val warm = if (secs.size > 1) secs.drop(1) else secs
      println(f"[scratch] $name TOTAL min ${secs.min}%.2f " +
        f"warm_min ${warm.min}%.2f max ${secs.max}%.2f")
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

/** Step-level timing of the passage builds: replicates passageBuild's
  * wave sequence with a wall-clock print per wave, so "the build is
  * slow" decomposes into WHICH wave (chunk ingest vs train+encode vs
  * incremental re-encode vs redelivery no-op).
  */
object ScratchPassage {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pw] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 3).foreach { round =>
      val root = java.nio.file.Files.createTempDirectory("pw").toString
      val (ck, vec) = (s"$root/chunks", s"$root/vec")
      val base = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val stale = base.withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(lit("stale draft chunk "), col("text")))
          .otherwise(col("text")))
      def vecIngest(ids: org.apache.spark.sql.DataFrame) =
        graft.streaming.Streams.chunkVectorIngestBatch(
          spark, ck, vec, ids, dims = 16, m = 4, codes = 8, cells = 8,
          trainPerMille = 250)
      val allIds = base.select(col("doc_id"))
      val draftIds = base.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"))
      println(s"[pw] === round $round ===")
      t("chunk1")(graft.streaming.Streams.chunkIngestBatch(base, ck,
        "doc_id", "text", window = 32, overlap = 8))
      t("vec1-train")(vecIngest(allIds))
      t("chunk2-stale")(graft.streaming.Streams.chunkIngestBatch(stale, ck,
        "doc_id", "text", window = 32, overlap = 8))
      t("vec2-draft")(vecIngest(draftIds))
      t("chunk3-base")(graft.streaming.Streams.chunkIngestBatch(base, ck,
        "doc_id", "text", window = 32, overlap = 8))
      t("vec3-draft")(vecIngest(draftIds))
      t("vec4-noop")(vecIngest(draftIds))
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
    spark.stop()
  }
}

/** Bimodality probe for the standing-store lifecycle queries: runs each
  * named query's BUILD phase SPARK_GRAFT_SCRATCH_BUILDS times (each
  * build wipes and recreates its store — cold-store by construction)
  * and its PROBE 3 times, reporting per-run wall seconds plus the GC
  * and JIT-code-cache deltas that separate "the plan got slower" from
  * "the session got sick". One session, so a mid-list slowdown that a
  * later control (pass sim_pq_store_takedown last) does NOT show is
  * query-specific, not session drift.
  */
object ScratchPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBuilds = sys.env.getOrElse("SPARK_GRAFT_SCRATCH_BUILDS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      // Same codegen-class cache sizing as Bench: quiet floors must be
      // measured under the engine config the bench runs.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Same sf disclosure as Scratch.main: warm_pins.py refuses logs
    // whose sf mismatches the reference.
    println(s"[phases] sf $sfDir")
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime.max(0L)).sum
    def ccMb(): Long =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(_.getUsage.getUsed).sum / (1024 * 1024)
    def jitMillis(): Long = Option(java.lang.management.ManagementFactory
      .getCompilationMXBean).map(_.getTotalCompilationTime).getOrElse(0L)
    def janinoCount(): Long = org.apache.spark.metrics.source
      .CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    val phases = SparkEntry.benchPhases
    args.foreach { name =>
      phases.get(name) match {
        case None => println(s"[phases] $name has no build/probe split; skipping")
        case Some(ph) =>
          val secs = (1 to nBuilds).map { i =>
            val gc0 = gcMillis(); val jit0 = jitMillis()
            val jan0 = janinoCount(); val t0 = System.nanoTime()
            ph.build(spark, sfDir)
            val sec = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache()
            println(f"[phases] $name build$i $sec%.2f s gc+${gcMillis() - gc0}ms " +
              f"jit+${jitMillis() - jit0}ms jan+${janinoCount() - jan0} cc${ccMb()}mb")
            sec
          }
          println(f"[phases] $name BUILD min ${secs.min}%.2f max ${secs.max}%.2f " +
            f"spread ${secs.max / secs.min}%.2fx")
          (1 to 3).foreach { i =>
            val t0 = System.nanoTime()
            ph.probe(spark, sfDir).write.format("noop").mode("overwrite").save()
            println(f"[phases] $name probe$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
            spark.catalog.clearCache()
          }
      }
    }
    spark.stop()
  }
}

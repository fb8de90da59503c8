package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and reports per-query wall seconds. Each query is
  * materialized through the noop datasource — a full write-path
  * execution that (unlike `count()`) cannot have its projections pruned
  * away by Catalyst, so hash/regex/projection-heavy queries are
  * measured for real.
  *
  * Measurement protocol: a short untimed warmup (cheap queries that
  * touch parquet scan + shuffle + codegen paths) absorbs session/JIT
  * init, then SPARK_GRAFT_BENCH_PASSES (default 2) full timed passes
  * run and the per-query MIN is reported. Without this, the first
  * alphabetical queries absorb the whole JVM cold tax and the total
  * reads ~2.5× the steady state the engine actually delivers.
  *
  * Output contract (the driver tail-parses stdout, so the LAST line
  * must stay short — a single ~3.5 KB line gets truncated):
  *   1. the full `{"metric":"total",...,"queries":{...}}` object is
  *      written to SPARK_GRAFT_BENCH_OUT (default `bench_out.json` in
  *      the working directory);
  *   2. the same full object prints on its own stdout line (times
  *      rounded to 3 decimals) for humans;
  *   3. the FINAL stdout line is a short total-only JSON object.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ContextCleaner frees shuffle files / broadcasts via weak refs,
      // i.e. only after a GC — and the 16 GB bench heap can run a
      // hundred queries without one (the default periodic-GC interval
      // is 30 MINUTES). Late heavy queries then pay for the whole
      // session's accumulated shuffle/broadcast state; a tight
      // periodic GC bounds it at a few ~100 ms full GCs per session.
      .config("spark.cleaner.periodicGC.interval", "30s")
      // The dense-session store-build tax (r19 VERDICT lead item) is
      // JIT/codegen churn, not GC: the r20 diagnostic bench measured
      // the neardup-fanout build at 79.8 s wall with 53.6 s of JIT-
      // compiler time and 999 Janino compiles (GC 3.0 s), and the
      // passage/index families at 2-5x their quiet floors with jit_ms
      // of the same order as the excess (bench_out
      // `lifecycle_build_diag`). Root cause: whole-stage-codegen
      // classes are cached in a 100-entry LRU
      // (spark.sql.codegen.cache.maxEntries default), which a
      // 268-query session thrashes — every store build re-Janinos and
      // re-JITs ~1000 generated classes that an earlier build of the
      // same family already compiled (fresh stores replay the same
      // batch-id literals, so the sources are bit-identical). Sizing
      // the cache for the session turns repeat-family builds into
      // warm-class reuse. Not a local[32]-ism: any long-lived session
      // running many distinct queries (a real deployment's driver)
      // wants the cache sized to its working set; 24 g heap absorbs
      // the retained classes (~100 MB at 8192 entries here).
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Local-iteration filter (mirrors Verify): SPARK_GRAFT_ONLY=a,b
    // benches just those queries. Unset (the driver) → all.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // Session-health probes: cumulative GC ms and JIT code-cache
    // occupancy. Both are per-JVM, not per-query, but the DELTA across a
    // query's run attributes session effects (GC pressure, code-cache
    // exhaustion stopping the JIT) to the queries that suffer them —
    // r5's dd_jaccard ran 14.3 s in-session vs 5.4 s warm standalone
    // with no plan difference, and these numbers are how that gap is
    // diagnosed rather than guessed at.
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime.max(0L)).sum
    def codeCacheUsedMb(): Long =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(_.getUsage.getUsed).sum / (1024 * 1024)
    // Cumulative JIT-compiler time and Janino (whole-stage-codegen)
    // compile count: the r19/r20 dense-session build tax shows up with
    // near-zero GC share, so the diagnostics must separate "the JVM
    // was busy compiling" from "the plan got slower" per BUILD, not
    // per session (r20 measured search_passage_rerank_topk at 5.2x its
    // quiet floor inside a full bench with 23 s session GC total).
    def jitMillis(): Long = Option(java.lang.management.ManagementFactory
      .getCompilationMXBean).map(_.getTotalCompilationTime).getOrElse(0L)
    def janinoCount(): Long = org.apache.spark.metrics.source
      .CodegenMetrics.METRIC_COMPILATION_TIME.getCount

    final case class Run(sec: Double, gcMs: Long)

    // Returns None when the query throws so fail-fast timings never win
    // the per-query min. Cache is cleared after every query: a few LLM
    // queries persist intermediates for intra-query reuse, and letting
    // six shingle caches pile up across an 87-query pass puts later
    // queries under eviction pressure (r4 showed dd_jaccard at 4.6× its
    // warm cost from exactly this).
    def runOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Run] = {
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      if (ok) Some(Run(elapsed, gcMillis() - gc0)) else None
    }

    // Untimed warmup: cheap queries covering scan, shuffle, join and
    // string/hash codegen paths, so pass 1 is not charged for JVM init.
    val warmupNames = Seq("c17_string_lengths", "agg_rollup_geo",
      "join_broadcast_geo_rollup", "a5_approx_distinct_monitor")
    queries.filter(q => warmupNames.contains(q._1))
      .foreach { case (n, f) => runOne(n, f) }
    // The dd_* block's shared substrate — the documents scan and the
    // native shingle/minhash kernels — warmed once, untimed: r9
    // measured dd_keep_best_per_cluster pass-1 at 2.4x its min and
    // dd_minhash at 2.5x with near-zero GC share, i.e. page-cache/JIT
    // cold-start on exactly these frames, not plan or memory pressure.
    runOne("warm_dd_shingles", (s, dir) =>
      graft.operators.Dedup.minhashSignatures(
        graft.operators.Dedup.hashedShingleArrays(
          Tables.documents(s, dir), "doc_id", "text", 3), 128))
    // The standing-store machinery (commit/ledger/generation plumbing,
    // index build/append/probe, chunk + chunk-vector encode) JIT-warms
    // on whichever lifecycle BUILD runs first — r18's driver-style
    // sessions measured the schedule's first store build at up to 4x
    // its steady state (search_bm25_index_upsert 31.7 s vs 7.9-10.9
    // across three sibling sessions; ScratchPhases pins the same 2.8-
    // 3.3x first-build tax on the chunk-vector family) while every
    // later build of the family ran warm. Charge that tax to warmup,
    // not to the first pinned row: tiny untimed slices through the
    // index and chunk-vector store paths.
    runOne("warm_index_store", (s, dir) => {
      import org.apache.spark.sql.functions.col
      val tmp = java.nio.file.Files
        .createTempDirectory("warm-idx").toString + "/index"
      val slice = Tables.documents(s, dir).limit(256)
      graft.operators.Search.buildIndex(slice, "doc_id", "text", tmp)
      graft.operators.Search.indexAppend(slice, "doc_id", "text", tmp): Unit
      graft.operators.Search.bm25FromIndexTopK(s, tmp,
        Seq("spark", "vector"), k = 5)
    })
    runOne("warm_ann_store", (s, dir) => {
      import org.apache.spark.sql.functions.col
      val tmp = java.nio.file.Files
        .createTempDirectory("warm-ann").toString + "/idx"
      val emb = Tables.embeddings(s, dir).limit(128)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.operators.Similarity.annStoreAppend(emb, tmp,
        planes = 8, dims = 64): Unit
      graft.operators.Similarity.annStoreTopK(s, tmp,
        emb.filter(col("id") < 4), planes = 8, dims = 64, k = 3)
    })
    runOne("warm_chunk_vec_store", (s, dir) => {
      import org.apache.spark.sql.functions.col
      val root = java.nio.file.Files
        .createTempDirectory("warm-ckv").toString
      val slice = Tables.documents(s, dir).limit(128)
        .select(col("doc_id"), col("text"))
      graft.streaming.Streams.chunkIngestBatch(slice, s"$root/chunks",
        "doc_id", "text", window = 32, overlap = 8)
      graft.streaming.Streams.chunkVectorIngestBatch(s, s"$root/chunks",
        s"$root/vec", slice.select(col("doc_id")), dims = 16, m = 4,
        codes = 8, cells = 8): Unit
      graft.streaming.Streams.passageTopK(s, s"$root/vec",
        "spark vector", dims = 16, kPassages = 5, kDocs = 3, nprobe = 2)
    })

    // SESSION SCHEDULE: the measured heavyweights run FIRST — on the
    // session's cleanest page-cache/JIT state — with one extra pass
    // (their pass-to-pass swings are the largest: r6 measured 16→5.4 s
    // on dd_minhash with <2 s of it GC), then an explicit GC + settle
    // barrier releases their shuffle files and broadcasts (the
    // ContextCleaner frees via weak refs, i.e. only after a GC) before
    // the long alphabetical tail. Ordering within the heavy block is
    // most-expensive-first.
    // The standing-store lifecycle queries (index/ANN build + upsert +
    // probe) lead the block: r7 measured search_bm25_index_upsert at
    // 19.2 s in-session vs 4.2 s isolated purely from session density
    // when it ran in the alphabetical tail.
    val heavyNames = Seq(
      "search_bm25_index_upsert", "search_hybrid_rrf",
      "search_hybrid_rrf_multiprobe", "search_hybrid_rrf_auto",
      "pl_fanout_gated_roundtrip", "pl_fanout_neardup_gated_roundtrip",
      "dd_neardup_clusters", "pl_corpus_build_e2e",
      "mm_phash_near_dup", "dd_jaccard_blocked_pairs",
      "s13_s17_partitioned_merge_store", "pl_crawl_bfs_site",
      "search_bm25_index_delete", "join_bloom_prefilter",
      "s17_compact_small_files", "sim_ann_upsert_topk",
      "x4_bfs_reachability", "sim_ann_partitioned_topk",
      "dd_keep_best_per_cluster", "search_more_like_this",
      "search_phrase_index_topk", "search_bm25_index_topk",
      "search_bm25_index_bucketed", "search_phrase_index_bucketed",
      "dd_incremental_lsh", "sim_ivf_topk", "sim_ivfpq_topk",
      "sim_pq_adc_topk", "sim_pq_store_upsert_topk",
      "dd_minhash_lsh_pairs", "dd_embedding_near_dup", "gr_pagerank_topk")
    val heavyPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_HEAVY_PASSES",
      (passes + 1).toString).toInt.max(1)
    val byName = queries.toMap
    val heavy = heavyNames.filter(byName.contains).map(n => n -> byName(n))
    val rest = queries.filterNot(q => heavyNames.contains(q._1))

    def gcBarrier(): Unit = { System.gc(); Thread.sleep(1500) }

    // BUILD/PROBE SPLIT for the standing-store lifecycle queries
    // (SparkEntry.benchPhases): their store BUILD runs once per session
    // (timed into buildSecs), then every pass times the read-only PROBE
    // warm — mirroring how a deployment amortizes one build across many
    // probes, and removing build-I/O variance from the pass-to-pass
    // spread (r8 measured up to 5.8× pass-1/min on exactly these).
    // The headline per-query seconds stay comparable across rounds:
    // build + min(probe) = the same work the monolithic query did.
    val splits = SparkEntry.benchPhases
    val buildSecs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // Per-build session-health attribution (diagnostic only): gc/jit
    // deltas and Janino compile count across the build call.
    final case class BuildDiag(gcMs: Long, jitMs: Long, janino: Long)
    val buildDiag = scala.collection.mutable.LinkedHashMap.empty[String, BuildDiag]

    val runs = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[Option[Run]]]
    def timeBlock(qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
        np: Int): Unit =
      (1 to np).foreach { pass =>
        qs.foreach { case (name, fn) =>
          val record: Option[Run] = splits.get(name) match {
            case Some(ph) =>
              if (pass == 1) {
                val (gc0, jit0, jan0) = (gcMillis(), jitMillis(), janinoCount())
                val t0 = System.nanoTime()
                val ok = try { ph.build(spark, sfDir); true }
                  catch { case e: Throwable =>
                    System.err.println(
                      s"[bench] $name build failed: ${e.getMessage}")
                    false
                  }
                buildDiag(name) = BuildDiag(gcMillis() - gc0,
                  jitMillis() - jit0, janinoCount() - jan0)
                // Drop build-time cache residue FIRST so the untimed
                // warm-up probe below measures-and-warms exactly the
                // state every timed probe will see (runOne clears after
                // itself, so probes all start cache-cold and equal).
                spark.catalog.clearCache()
                if (ok) {
                  buildSecs(name) = (System.nanoTime() - t0) / 1e9
                  // One untimed probe: the first read of a fresh store
                  // pays page-cache fill + plan codegen that every
                  // later probe amortizes — charge it to warmup, not
                  // to pass 1 (r9 preview measured first-probe at up
                  // to 3.5x the warm cost from exactly this).
                  runOne(name, ph.probe): Unit
                }
              }
              if (buildSecs.contains(name)) runOne(name, ph.probe) else None
            case None => runOne(name, fn)
          }
          runs(name) = runs.getOrElse(name, Vector.empty) :+ record
        }
      }
    timeBlock(heavy, heavyPasses)
    gcBarrier()
    timeBlock(rest, passes)

    // Min over SUCCESSFUL passes only; a query that failed every pass is
    // reported by name, not by a (meaningless) fail-fast timing. Split
    // queries report build + min(probe).
    val results = queries.flatMap { case (name, _) =>
      val oks = runs.getOrElse(name, Vector.empty).flatten
      if (oks.nonEmpty)
        Some(name -> (oks.map(_.sec).min + buildSecs.getOrElse(name, 0.0)))
      else None
    }
    val failed = queries.map(_._1).filterNot(results.map(_._1).toSet)
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    // WALL-TIME REGRESSION GATE. BENCH_r11 proved that a 27× per-query
    // regression can ship with green oracles, green tests, and green
    // plan-shape pins (whole-stage-codegen evaluation order is invisible
    // to all three) — only the bench caught it, a round too late. So the
    // bench itself now compares every query against the committed
    // reference (tools/bench_reference.json, refreshed each accepted
    // round): a query counts as regressed when it exceeds 2× its
    // reference AND is at least 0.75 s absolute over it (sub-second
    // queries jitter past 2× on page-cache luck alone). STRICT by
    // default — regressions land in the output JSON, the short line's
    // n_regressed, loud stderr, AND a nonzero exit; the driver's
    // round-close invocation sets no env, so the default is the only
    // mode that verifiably arms the wall there.
    // SPARK_GRAFT_BENCH_GATE=report downgrades to report-only for
    // local iteration (e.g. benching at sf0.01 where the sf0.1
    // reference legitimately doesn't apply). The active mode is
    // emitted as "gate" in both JSON lines so a verdict can confirm
    // the wall was armed, not assume it.
    // Round-18 gate refinement: standing-store lifecycle entries may pin
    // {build, probe} SEPARATELY (the data was always in bench_out's
    // lifecycle_builds/passes; r17 shipped three upward total-only
    // re-pins justified by build-phase session variance — per-phase
    // pins end that ratchet). The PROBE gate stays 2x+0.75s: probes are
    // the steady-state serving cost, measured warm as the min over
    // passes. The BUILD gate is 3x+1.5s: a build runs ONCE per session,
    // so its reading carries the first-of-family codegen+JIT tax
    // wherever the schedule lands it — measured 2.8x cold-vs-warm on
    // identical code (r18 ScratchPhases, search_passage_rerank_topk
    // 15.0 s first build vs 5.4 s warm in one session), which a 2x wall
    // would re-trip on session luck rather than on regressions.
    val BuildMult = 3.0
    val BuildAbs = 1.5
    val ProbeMult = 2.0
    val ProbeAbs = 0.75
    val refPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF",
      "tools/bench_reference.json")
    val gateEnv = sys.env.get("SPARK_GRAFT_BENCH_GATE")
    // Fail-safe: anything that is not exactly "report" runs strict —
    // but a mistyped opt-out attempt ("off", "reports", "0") must be
    // VISIBLE, not silently reinterpreted as strict.
    gateEnv.filterNot(Set("report", "strict")).foreach(v =>
      System.err.println(s"[bench] WARNING: unrecognized " +
        s"SPARK_GRAFT_BENCH_GATE='$v' - only 'report' downgrades the " +
        "gate; running STRICT"))
    val strictGate = !gateEnv.contains("report")
    // Reference times only mean anything at the scale factor they were
    // measured at. The reference records the trailing sfN.N component
    // (not the full dataset path — the same scale mounted elsewhere is
    // still comparable), and a reference WITHOUT an sf field is treated
    // as mismatched rather than trusted: references are regenerated
    // every accepted round, so a missing field means a stale/foreign
    // file, exactly what the gate must not silently trust.
    def sfTag(path: String): String =
      path.split('/').reverseIterator
        .find(_.matches("sf[0-9.]+")).getOrElse(path)
    var sfMismatchWarned = false
    // Pins are only comparable at the core count they were measured at,
    // for the same reason as the sf guard — but unlike a wrong-sf or
    // missing reference (stale/foreign file, strict-fatal), a core-count
    // mismatch is a SANCTIONED scaling run: the driver re-runs this
    // bench at a lower SPARK_GRAFT_CPUS to measure per-query scaling,
    // and gating those readings against local[32] pins would only
    // manufacture false regressions (a 2x-at-8-cores reading is the
    // parallel fraction, not a code regression). The wall gate disarms
    // with a warning and the run stays rc=0-eligible; the output JSON
    // records `cpus` + gate_armed=false so a disarmed run is visible in
    // the artifact, and the round-close gate remains the strict armed
    // run at the reference's own core count.
    var cpuMismatch = false
    // A reference entry is either a plain number (total seconds, gated
    // at 2x+0.75 on build+min(probe)) or {"build": b, "probe": p} for a
    // lifecycle query (gated per-phase). A lifecycle entry may also
    // carry "build_warm": the QUIET-session warm build minimum from the
    // committed ScratchPhases protocol (tools/scratch_phases_r*.log via
    // tools/warm_pins.py) — the r18 verdict's build-gate blind spot:
    // with builds gated at 3x+1.5s AND the store families JIT-warmed
    // untimed, a genuine ~2.5x build regression ships silently. The
    // secondary warm pin watches builds at 1.5x+1.0s against that
    // quiet-session floor. ARMED round 20 on the AGGREGATE flag count,
    // not per entry: two rounds of watch data show per-entry 1.5x
    // cannot be armed (host-level stalls — near-zero gc/jit/janino
    // deltas — hit 1-3 arbitrary builds even in quiet ScratchPhases
    // sessions), but a real shared-path regression inflates the whole
    // store-build surface (the r19 codegen-LRU tax flagged 19/37
    // entries; the fixed session flags 4). So: more than
    // SPARK_GRAFT_WARM_WATCH_MAX (default 8 = 2x the healthy-session
    // reading, under half the regression signature) flagged builds is
    // a session-wide build regression and fails a strict bench;
    // anything at or under stays report-only (stderr + JSON
    // `build_warm_watch`).
    // Round 20 (VERDICT item 3): a non-lifecycle entry may be an object
    // {"total": pin, "total_warm": floor} — the floor is the committed
    // quiet-session warm minimum (graft.Scratch, runs 2..N, same engine
    // config; tools/total_floors.py). It ends the total-pin ratchet the
    // same way build_warm did for builds: an upward total re-pin
    // without a floor reading is now a policy violation (the floor in
    // the file is the evidence a re-pin must cite), and the watch below
    // reports totals that drift past 1.5x + 0.5s of their floor so
    // density drift is data, not folklore. Report-only: these rows are
    // 0.2-3s, where host-level noise swamps a per-entry armed gate.
    final case class Ref(total: Option[Double], build: Option[Double],
      probe: Option[Double], buildWarm: Option[Double],
      totalWarm: Option[Double])
    val WarmMult = 1.5
    val WarmAbs = 1.0
    val WarmWatchMax = sys.env.get("SPARK_GRAFT_WARM_WATCH_MAX")
      .map(_.toInt).getOrElse(8)
    val refTimes: Map[String, Ref] =
      try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new java.io.File(refPath))
        val refSf = Option(node.get("sf")).map(_.asText())
        val refCpus = Option(node.get("cpus")).map(_.asText())
        val q = node.get("queries")
        if (q == null) Map.empty
        else if (refCpus.nonEmpty && !refCpus.contains(cpus)) {
          System.err.println(s"[bench] NOTE: regression reference " +
            s"$refPath was measured at ${refCpus.get} cpus but this run " +
            s"uses $cpus - wall-time gate NOT active for this scaling " +
            "run (not a strict failure; the close gate is the run at " +
            s"${refCpus.get} cpus)")
          cpuMismatch = true
          Map.empty
        } else if (!refSf.map(sfTag).contains(sfTag(sfDir))) {
          System.err.println(s"[bench] WARNING: regression reference " +
            s"$refPath was measured at sf '${refSf.getOrElse("<absent>")}' " +
            s"but this run uses '$sfDir' - wall-time gate NOT active for " +
            "this run" +
            (if (strictGate) " (strict mode will exit nonzero)" else ""))
          sfMismatchWarned = true
          Map.empty
        } else {
          import scala.jdk.CollectionConverters._
          q.properties().asScala.map { e =>
            val v = e.getValue
            e.getKey -> (if (v.isObject)
              Ref(Option(v.get("total")).map(_.asDouble()),
                Option(v.get("build")).map(_.asDouble()),
                Option(v.get("probe")).map(_.asDouble()),
                Option(v.get("build_warm")).map(_.asDouble()),
                Option(v.get("total_warm")).map(_.asDouble()))
            else Ref(Some(v.asDouble()), None, None, None, None))
          }.toMap
        }
      } catch { case _: Exception => Map.empty }
    // A missing/unreadable/wrong-sf reference must never read as "gate
    // green": warn always (unless the specific sf-mismatch warning
    // already printed), and under strict mode it is itself a failure —
    // the silent-disable path would recreate exactly the
    // regression-ships-unnoticed failure mode the gate exists for.
    if (refTimes.isEmpty && !sfMismatchWarned && !cpuMismatch)
      System.err.println(s"[bench] WARNING: regression reference $refPath " +
        "missing, unreadable, or for a different sf - wall-time gate " +
        "NOT active" +
        (if (strictGate) " (strict mode will exit nonzero)" else ""))
    // (name, phase, sec, ref): phase is "total", "build", or "probe".
    val regressions = results.flatMap { case (name, sec) =>
      refTimes.get(name).toSeq.flatMap { ref =>
        val total = ref.total.collect {
          case r if sec > r * ProbeMult && sec - r > ProbeAbs =>
            (name, "total", sec, r)
        }
        val build = ref.build.flatMap(r => buildSecs.get(name).collect {
          case b if b > r * BuildMult && b - r > BuildAbs =>
            (name, "build", b, r)
        })
        val probe = ref.probe.flatMap { r =>
          val oks = runs.getOrElse(name, Vector.empty).flatten
          if (oks.isEmpty) None
          else Some(oks.map(_.sec).min).collect {
            case p if p > r * ProbeMult && p - r > ProbeAbs =>
              (name, "probe", p, r)
          }
        }
        total.toSeq ++ build.toSeq ++ probe.toSeq
      }
    }
    regressions.foreach { case (n, phase, s, ref) =>
      System.err.println(f"[bench] REGRESSION $n ($phase): ${s}%.3f s vs " +
        f"reference ${ref}%.3f s (${s / ref}%.1fx) - investigate before " +
        "shipping; refresh tools/bench_reference.json only with a " +
        "written justification")
    }
    // Secondary warm-build watch: builds over 1.5x + 1.0s of their
    // committed quiet-session warm minimum. Catches the ~1.5-3x band
    // the 3x primary gate can't see. Per-entry flags are report-only
    // (host-level stalls hit 1-3 builds even in quiet sessions); the
    // AGGREGATE count over WarmWatchMax is armed — that signature only
    // appears when a shared build path regressed session-wide (see the
    // Ref scaladoc for the two rounds of data behind the threshold).
    val warmWatch = results.map(_._1).sorted.flatMap { name =>
      refTimes.get(name).flatMap(_.buildWarm).flatMap(w =>
        buildSecs.get(name).collect {
          case b if b > w * WarmMult && b - w > WarmAbs =>
            (name, b, w)
        })
    }
    warmWatch.foreach { case (n, b, w) =>
      System.err.println(f"[bench] BUILD-WARM WATCH $n: build ${b}%.3f s " +
        f"vs quiet-session warm min ${w}%.3f s (${b / w}%.1fx) - " +
        "per-entry report-only; check session density before " +
        "suspecting the code")
    }
    // Total-warm watch (report-only, see the Ref scaladoc): totals
    // past 1.5x + 0.5s of their committed quiet floor.
    val totalWatch = results.sortBy(_._1).flatMap { case (name, sec) =>
      refTimes.get(name).flatMap(_.totalWarm).collect {
        case w if sec > w * WarmMult && sec - w > 0.5 => (name, sec, w)
      }
    }
    totalWatch.foreach { case (n, s, w) =>
      System.err.println(f"[bench] TOTAL-WARM WATCH $n: ${s}%.3f s vs " +
        f"quiet floor ${w}%.3f s (${s / w}%.1fx) - report-only density " +
        "data; an upward re-pin must cite this floor")
    }
    val warmWatchOver = warmWatch.size > WarmWatchMax
    if (warmWatchOver)
      System.err.println(s"[bench] BUILD-WARM WATCH: ${warmWatch.size} " +
        s"builds over 1.5x their quiet floor (armed threshold " +
        s"$WarmWatchMax) - a session-wide store-build regression; " +
        "strict mode fails. Compare lifecycle_build_diag jit_ms/janino_n " +
        "against tools/scratch_phases_r20.log before re-pinning anything")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Diagnostics: every pass's (sec, gcMs) per query, so session
    // inflation (pass-1 vs pass-2 spread, GC share of a slow run) is
    // measurable from the output instead of re-run folklore.
    val passesJson = queries.flatMap { case (name, _) =>
      val rs = runs.getOrElse(name, Vector.empty)
      if (rs.forall(_.isEmpty)) None
      else Some("\"" + name + "\":[" + rs.map {
        case Some(r) => s"""{"sec":${r3(r.sec)},"gc_ms":${r.gcMs}}"""
        case None => "null"
      }.mkString(",") + "]")
    }.mkString("{", ",", "}")
    val total = r3(results.map(_._2).sum)
    // "gate" is the mode that RAN (strict|report) plus whether a usable
    // reference armed it — "strict" with refTimes empty still exits
    // nonzero, but a verdict reading the JSON needs to distinguish
    // "gated against 181 entries" from "strict-but-blind".
    val gateJson =
      s""""gate":"${if (strictGate) "strict" else "report"}",""" +
      s""""gate_armed":${refTimes.nonEmpty},"cpus":"$cpus""""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec",$gateJson,"queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    // The per-pass diagnostics triple the line size, so they go to the
    // FILE only — stdout lines past ~4 KB risk truncation in the
    // driver's tail capture.
    val heavyJson = heavy.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    // For split queries, `passes` holds PROBE-only runs; the one-time
    // store-build seconds are here. queries.<name> = build + min(probe).
    val buildsJson = buildSecs
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val buildDiagJson = buildDiag.map { case (k, d) =>
      "\"" + k + s"""\":{"gc_ms":${d.gcMs},"jit_ms":${d.jitMs},""" +
        s""""janino_n":${d.janino}}"""
    }.mkString("{", ",", "}")
    val regressionsJson = regressions.map { case (n, phase, s, ref) =>
      "\"" + n + ":" + phase + "\":{\"sec\":" + r3(s) +
        ",\"ref\":" + r3(ref) + "}"
    }.mkString("{", ",", "}")
    val warmWatchJson = warmWatch.map { case (n, b, w) =>
      "\"" + n + "\":{\"build\":" + r3(b) + ",\"warm_ref\":" + r3(w) + "}"
    }.mkString("{", ",", "}")
    val warmWatchMetaJson =
      s""""build_warm_watch_armed":{"max":$WarmWatchMax,""" +
      s""""flagged":${warmWatch.size},"over":$warmWatchOver}"""
    val totalWatchJson = totalWatch.map { case (n, s, w) =>
      "\"" + n + "\":{\"sec\":" + r3(s) + ",\"warm_ref\":" + r3(w) + "}"
    }.mkString("\"total_warm_watch\":{", ",", "}")
    val fullWithDiag = full.dropRight(1) +
      s""","passes":$passesJson,"gc_ms_total":${gcMillis()},""" +
      s""""code_cache_used_mb":${codeCacheUsedMb()},""" +
      s""""lifecycle_builds":$buildsJson,""" +
      s""""lifecycle_build_diag":$buildDiagJson,""" +
      s""""regressions":$regressionsJson,""" +
      s""""build_warm_watch":$warmWatchJson,$warmWatchMetaJson,""" +
      s"""$totalWatchJson,""" +
      s""""regression_ref":"${if (refTimes.isEmpty) "" else refPath}",""" +
      s""""schedule":{"heavy_first":$heavyJson,"heavy_passes":$heavyPasses,""" +
      s""""gc_barrier_after_heavy":true}}"""
    val short =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"n_regressed":${regressions.size},"n_warm_flagged":${warmWatch.size},$gateJson,"sf":"$sfDir"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (fullWithDiag + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    // Full object on its own line, then the short total-only line LAST.
    Console.out.flush()
    println(full)
    println(short)
    Console.out.flush()
    spark.stop()
    if (strictGate && (regressions.nonEmpty ||
        (refTimes.isEmpty && !cpuMismatch) || warmWatchOver))
      sys.exit(1)
  }
}

package graft.sources

import graft.SparkSpec

/** Ledger-level contract of the batch-id allocator (the store-level
  * crash/orphan behaviors are covered in SearchSpec / SimilaritySpec /
  * NeardupIngestSpec; this pins the allocator itself).
  */
class CommitsSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("commits-spec").toString + "/st"

  test("scopeMutationResolve: scoped under the floor without counting, " +
      "crossover at a quarter of the store") {
    // Under the floor the store count must NEVER be evaluated — the
    // micro-batch hot path pays zero extra jobs for the decision.
    def boom: Long = throw new IllegalStateException("store counted")
    assert(Commits.scopeMutationResolve(1L, boom))
    assert(Commits.scopeMutationResolve(Commits.ScopedResolveFloor, boom))
    // Above the floor: scoped only while batch < store / 4.
    val floor = Commits.ScopedResolveFloor
    assert(Commits.scopeMutationResolve(floor + 1, (floor + 1) * 4 + 1))
    assert(!Commits.scopeMutationResolve(floor + 1, (floor + 1) * 4))
    assert(!Commits.scopeMutationResolve(5_000_000L, 5_000_000L))
    assert(Commits.scopeMutationResolve(500_000L, 5_000_000L))
  }

  test("allocation is listing-only: ids burn without any data write") {
    val dir = tmp()
    // Fresh store: first id is 0, recorded as an attempt marker.
    assert(Commits.allocateBatchId(spark, dir, Seq(dir)) == 0L)
    assert(Commits.attempted(spark, dir) == Seq(0L))
    // Nothing committed, NO data ever written — the next allocation
    // must still skip id 0 (a crash between allocation and data write
    // burns the id; reuse would double rows under a later commit).
    assert(Commits.allocateBatchId(spark, dir, Seq(dir)) == 1L)
    // Committing advances the floor the same way.
    Commits.commit(spark, dir, 1L)
    assert(Commits.allocateBatchId(spark, dir, Seq(dir)) == 2L)
    assert(Commits.committed(spark, dir) == Seq(1L))
    assert(Commits.attempted(spark, dir).sorted == Seq(0L, 1L, 2L))
  }

  test("pre-marker store with committed ids AND a marker-less orphan " +
      "allocates above the orphan") {
    import spark.implicits._
    val dir = tmp()
    // An old-code store: committed b0 written directly (old commit()
    // recorded no attempt marker), plus a postings-style orphan at
    // batch 1 from a crashed old-code append. The ledger alone says
    // "next is 1" — allocating 1 would double the orphan's rows under
    // a committed marker, so the marker-less first allocation must
    // consult the data too.
    Seq((1L, 0L), (2L, 1L)).toDF("id", "batch").write.parquet(dir)
    val b0 = new org.apache.hadoop.fs.Path(s"$dir/_commits/b0")
    val fs = b0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(b0.getParent)
    fs.create(b0, true).close()
    assert(Commits.attempted(spark, dir).isEmpty)
    assert(Commits.allocateBatchId(spark, dir, Seq(dir)) == 2L)
  }

  test("commit records the attempt marker too, re-arming the fast path") {
    val dir = tmp()
    // Build/vacuum paths commit fixed ids without allocateBatchId; the
    // committed id must count as attempted or the next allocation
    // falls back to a data scan of the whole store.
    Commits.commit(spark, dir, 0L)
    assert(Commits.attempted(spark, dir) == Seq(0L))
    assert(Commits.allocateBatchId(spark, dir, Seq(dir)) == 1L)
  }

  test("ledger-less legacy store falls back to a data scan exactly once") {
    import spark.implicits._
    val dir = tmp()
    // Data at batches 0-2 with no ledger dir at all (a store whose
    // _commits was lost, or pre-marker data): the one-time data-scan
    // fallback allocates above the orphans.
    Seq((1L, 0L), (2L, 1L), (3L, 2L)).toDF("id", "batch")
      .write.parquet(dir)
    assert(Commits.allocateBatchId(spark, dir, Seq(dir)) == 3L)
    // That allocation recorded a marker, so the next one is pure
    // listing.
    assert(Commits.attempted(spark, dir) == Seq(3L))
    assert(Commits.allocateBatchId(spark, dir, Seq(dir)) == 4L)
  }

  test("a committed b<id> dir holding only hidden files reads as empty, " +
      "not as a schema-inference failure") {
    import spark.implicits._
    val dir = tmp()
    // b0 holds real data; b1 is a committed batch whose dir holds ONLY
    // hidden files (a stray .crc checksum — e.g. data files deleted by
    // a half-finished external cleanup). The same visibility predicate
    // must gate both the per-batch presence check and the flat check:
    // passing the .crc-only dir to the parquet reader would fail schema
    // inference and take the whole store read down with it.
    Seq((1L, 0L)).toDF("id", "batch").write.parquet(s"$dir/b0")
    val crcOnly = new org.apache.hadoop.fs.Path(s"$dir/b1/.f1.parquet.crc")
    val fs = crcOnly.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(crcOnly.getParent)
    fs.create(crcOnly, true).close()
    Seq(0L, 1L).foreach(Commits.commit(spark, dir, _))
    val committed = Commits.committed(spark, dir).sorted
    val read = Commits.readCommittedBatches(spark, dir, committed).get
      .select("id").as[Long].collect().toSeq
    assert(read == Seq(1L), s"expected only b0's row, got $read")
    // With NO readable batch at all, the read is None — not a throw.
    assert(Commits.readCommittedBatches(spark, dir, Seq(1L)).isEmpty)
  }

  test("mid-migration mix: flat and b<id> rows each read exactly once; " +
      "flat sweep refuses while committed") {
    import spark.implicits._
    val dir = tmp()
    // Old append layout: batches 0 and 1 as top-level flat files...
    Seq((1L, 0L), (2L, 0L), (3L, 1L)).toDF("id", "batch")
      .write.parquet(dir)
    // ...then the new layout appends batch 2 in its own directory.
    Seq((4L, 2L)).toDF("id", "batch").write.parquet(s"$dir/b2")
    Seq(0L, 1L, 2L).foreach(Commits.commit(spark, dir, _))
    val committed = Commits.committed(spark, dir).sorted
    assert(committed == Seq(0L, 1L, 2L))
    // The mixed read sees every committed row EXACTLY once — the root
    // path contributes only the flat files, never the b2 dir's rows.
    val read = Commits.readCommittedBatches(spark, dir, committed).get
      .select("id").as[Long].collect().sorted.toSeq
    assert(read == Seq(1L, 2L, 3L, 4L))
    // Only the flat-resident batches report as legacy.
    assert(Commits.committedFlatBatches(spark, dir, committed)
      == Seq(0L, 1L))
    // The sweep refuses while any flat batch is still committed.
    Commits.sweepFlatFiles(spark, dir, committed)
    assert(Commits.committedFlatBatches(spark, dir, committed)
      == Seq(0L, 1L))
    // Once the flat batches are uncommitted (the migration's rewrite
    // did that after moving their survivors), the files go — and the
    // store reads only the per-batch layout.
    Seq(0L, 1L).foreach(Commits.uncommit(spark, dir, _))
    Commits.sweepFlatFiles(spark, dir, Commits.committed(spark, dir))
    assert(Commits.committedFlatBatches(spark, dir, Seq(0L, 1L, 2L))
      .isEmpty)
    assert(Commits.readCommittedBatches(spark, dir, Seq(2L)).get
      .select("id").as[Long].collect().toSeq == Seq(4L))
  }

  test("committedDataBytes: listing-only, counts flat + committed dirs, " +
      "skips uncommitted dirs and hidden files") {
    import spark.implicits._
    val dir = tmp()
    assert(Commits.committedDataBytes(spark, dir) == 0L)
    Seq((1L, 0L)).toDF("id", "batch").write.parquet(s"$dir/b0")
    Seq((2L, 1L)).toDF("id", "batch").write.parquet(s"$dir/b1")
    Commits.commit(spark, dir, 0L) // b1 stays an uncommitted orphan
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bytesUnder(p: String): Long =
      fs.listStatus(new org.apache.hadoop.fs.Path(p)).filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }.map(_.getLen).sum
    assert(Commits.committedDataBytes(spark, dir) == bytesUnder(s"$dir/b0"))
    Commits.commit(spark, dir, 1L)
    assert(Commits.committedDataBytes(spark, dir)
      == bytesUnder(s"$dir/b0") + bytesUnder(s"$dir/b1"))
    // Flat (mid-migration) data files at the root count too.
    Seq((3L, 2L)).toDF("id", "batch")
      .write.mode("append").parquet(dir)
    assert(Commits.committedDataBytes(spark, dir)
      == bytesUnder(s"$dir/b0") + bytesUnder(s"$dir/b1") + bytesUnder(dir))
  }
}

package graft

import org.apache.spark.sql.types._

/** Loads every driver-generated fixture table through `Tables.*` and runs a
  * trivial action, so a fixture regeneration that drifts from what the
  * loaders accept fails here in `sbt test` — not later in the driver's
  * Verify run (round 8 lost 26 correctness entries to exactly that blind
  * spot: `sbt test` never touched `/root/testdata`, so an events.ts
  * re-encoding was invisible until the driver ran).
  *
  * Skips cleanly (canceled, not failed) when the fixture dir is absent so
  * the suite still passes on machines without the driver's testdata.
  */
class FixtureSmokeSpec extends SparkSpec {
  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

  private def fixture(): Unit =
    assume(new java.io.File(sfDir).isDirectory, s"fixture dir $sfDir absent")

  private val loaders: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
    "region"     -> (() => Tables.region(spark, sfDir)),
    "nation"     -> (() => Tables.nation(spark, sfDir)),
    "customer"   -> (() => Tables.customer(spark, sfDir)),
    "supplier"   -> (() => Tables.supplier(spark, sfDir)),
    "part"       -> (() => Tables.part(spark, sfDir)),
    "orders"     -> (() => Tables.orders(spark, sfDir)),
    "lineitem"   -> (() => Tables.lineitem(spark, sfDir)),
    "events"     -> (() => Tables.events(spark, sfDir)),
    "documents"  -> (() => Tables.documents(spark, sfDir)),
    "embeddings" -> (() => Tables.embeddings(spark, sfDir)),
  )

  for ((name, loadIt) <- loaders)
    test(s"$name loads through Tables and yields rows") {
      fixture()
      val df = loadIt()
      assert(df.count() > 0, s"$name is empty")
    }

  test("events.ts is normalized to microsecond TimestampType") {
    fixture()
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts came out as ${df.schema("ts").dataType}")
    // And the values are sane epoch-range instants, not mis-scaled nanos
    // read as micros (which would land ~50,000 years out).
    val yr = df.selectExpr("min(year(ts))", "max(year(ts))").head()
    assert(yr.getInt(0) >= 1990 && yr.getInt(1) <= 2100,
      s"events.ts years out of range: $yr — encoding mis-branch?")
  }

  test("events loader accepts a deliberately re-encoded int64-nanos file") {
    fixture()
    val tmp = java.nio.file.Files.createTempDirectory("graft-smoke-").toString
    try {
      // Re-encode the current fixture's ts as raw int64 nanoseconds —
      // the historical encoding — and check the loader still normalizes.
      Tables.events(spark, sfDir)
        .selectExpr("event_id", "unix_micros(ts) * 1000L AS ts",
          "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val df = Tables.events(spark, tmp)
      assert(df.schema("ts").dataType == TimestampType)
      val a = Tables.events(spark, sfDir).selectExpr("max(unix_micros(ts))").head().getLong(0)
      val b = df.selectExpr("max(unix_micros(ts))").head().getLong(0)
      assert(a == b, s"nanos round-trip drifted: $a vs $b")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("loader-sensitive dtypes match what downstream queries assume") {
    fixture()
    // embeddings.embedding: queries assume ArrayType(FloatType) — an
    // element-type flip (float→double) would silently change cosine math.
    val emb = Tables.embeddings(spark, sfDir).schema("embedding").dataType
    assert(emb == ArrayType(FloatType, containsNull = true) ||
           emb == ArrayType(FloatType, containsNull = false), s"embedding dtype drifted: $emb")
    // documents.text drives shingling/minhash; must stay a string.
    assert(Tables.documents(spark, sfDir).schema("text").dataType == StringType)
    // documents.source domain: pl_stratified_sample and
    // pl_mixture_budget_take hard-code per-source rates for src0-src19
    // while their oracles derive a rate for ANY 'srcN' — a regenerated
    // fixture with new source values would silently diverge the two
    // sides, so fail here instead.
    val sources = Tables.documents(spark, sfDir)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    val expected = (0 until 20).map(i => s"src$i").toSet
    assert(sources.subsetOf(expected),
      s"documents.source grew beyond src0-src19: ${sources -- expected}")
    // TPC-H date columns: queries assume timestamp-or-date, branch-normalized.
    for ((t, c) <- Seq(("orders", "o_orderdate"), ("lineitem", "l_shipdate"))) {
      val dt = Tables.load(spark, sfDir, t).schema(c).dataType
      assert(dt == TimestampType || dt == TimestampNTZType || dt == DateType,
        s"$t.$c dtype drifted: $dt")
    }
  }
}

package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scan-pruning proofs for the partitioned store: static partition
  * pruning pushes literal partition predicates into the file listing,
  * and DYNAMIC partition pruning subscribes the store's scan to the
  * dim side's runtime filter — at 100 TB the difference between
  * reading k site partitions and reading the store.
  */
class StorePruningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("graft-dpp")
      .toString + "/docs"
    val docs = spark.range(0, 1000).select(
      col("id").as("doc_id"),
      concat(lit("site"), col("id") % 10).as("site"),
      md5(col("id").cast("string")).as("text"))
    Store.writePartitioned(docs, p, "site")
    p
  }

  test("literal partition predicate prunes at the file listing") {
    val plan = Store.read(spark, path)
      .filter(col("site") === "site3")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters"))
    // The partition filter must carry the literal, and the data filter
    // must NOT re-check it per row (partition columns aren't in files).
    assert(plan.contains("site3"))
  }

  test("join against a filtered dim triggers dynamic partition pruning") {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dims = spark.range(0, 10).select(
        concat(lit("site"), col("id")).as("site"),
        (col("id") % 3).as("tier"))
      val plan = Store.read(spark, path)
        .join(dims.filter(col("tier") === 0), Seq("site"))
        .groupBy(col("site")).agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString()
      assert(plan.contains("dynamicpruning"),
        s"store scan not subscribed to runtime partition filter:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named query built by
  * one of the `graft.queries.*` groups; each carries its DuckDB oracle SQL
  * where SQL-expressible.
  */
object SparkEntry {

  private lazy val all: Seq[QueryDef] =
    graft.queries.RelationalQueries.defs ++
      graft.queries.ScalarQueries.defs ++
      graft.queries.LlmQueries.defs ++
      graft.queries.PipelineQueries.defs ++
      graft.queries.StreamQueries.defs ++
      graft.queries.SourceQueries.defs ++
      graft.queries.CrawlQueries.defs ++
      graft.queries.MediaQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's core semantic in one declarative chain: normalize
    * text, sha256 content-hash, dedup by content (A6+A8,
    * `/root/reference/utils.py:15-20`, `/root/reference/db/postgres_store.py:84-103`),
    * then count surviving documents per source.
    */
  def entry(spark: SparkSession): DataFrame =
    Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("content_hash", HashFunctions.contentHash(col("text")))
      .dropDuplicates("content_hash")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("source"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Bench-only build/probe splits for the standing-store lifecycle
    * queries (see [[BenchPhases]]); keys are a subset of [[queries]].
    */
  def benchPhases: Map[String, BenchPhases] =
    graft.queries.LlmQueries.benchPhases
}

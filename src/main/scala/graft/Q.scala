package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query with an optional DuckDB oracle.
  *
  * Every operator the engine claims (SURVEY.md §2) is exposed as one of
  * these: `fn` builds the Spark plan against the parquet tables under
  * `sfDir`, and `oracle` is the equivalent ANSI SQL the driver runs in
  * DuckDB over the same tables for the hash-compare correctness gate.
  *
  * Conventions that keep the two sides hash-identical:
  *   - every floating-point output column is `round(...)`-ed the same way
  *     on both sides;
  *   - raw timestamps are never emitted (epoch seconds / dates instead —
  *     `events.ts` is nanosecond-precision parquet, which Spark truncates
  *     to micros while DuckDB keeps ns);
  *   - all outputs have a deterministic ORDER BY, and ties at any
  *     LIMIT/top-k boundary are broken by a unique key;
  *   - aggregate/computed columns carry the same alias on both sides
  *     (the driver compare sorts columns by name).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Query with a full DuckDB oracle. */
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Query with no SQL-expressible oracle (driver records rows-only). */
  def noOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}

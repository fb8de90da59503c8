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
  *     `events.ts`'s parquet encoding varies across fixture
  *     regenerations, see [[Tables.events]], and keeping instants as
  *     integers makes both sides encoding-agnostic);
  *   - all outputs have a deterministic ORDER BY, and ties at any
  *     LIMIT/top-k boundary are broken by a unique key;
  *   - aggregate/computed columns carry the same alias on both sides
  *     (the driver compare sorts columns by name).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Build/probe split of a STANDING-STORE lifecycle query, for the
  * benchmark only. The monolithic [[QueryDef.fn]] (what Verify and the
  * driver's correctness gate run) builds its scratch store and probes
  * it in one call — correct, but it re-pays the full store build on
  * every bench pass, so the reported pass-to-pass spread measured
  * build-I/O variance rather than the probe the deployment actually
  * repeats (a real deployment amortizes one build across many probes).
  * `build` constructs the store once per bench session (timed and
  * reported separately); `probe` is the read-only query against it,
  * timed warm across passes. Both must compose to EXACTLY the work the
  * monolithic fn does — Bench reports the query's headline seconds as
  * `build + min(probe)` so round-over-round numbers stay comparable.
  */
final case class BenchPhases(
    build: (SparkSession, String) => Unit,
    probe: (SparkSession, String) => DataFrame)

object QueryDef {
  /** Query with a full DuckDB oracle. */
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Query with no SQL-expressible oracle (driver records rows-only). */
  def noOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** Drop-in replacement for a TERMINAL `orderBy` on a BOUNDED result
    * (the dump/compare surface every QueryDef ends with): one
    * round-robin exchange into a single partition plus a local sort.
    *
    * A terminal `orderBy` plans a range exchange whose bounds-SAMPLING
    * job executes the child plan a second time; on narrow
    * scan→project pipelines (extraction, decode, per-doc scoring —
    * no shuffle below the sort, so nothing is reused) that exactly
    * doubles the query's cost (measured 2× on dd_jaccard's verify
    * pipeline and the txt_/s4_ families). `orderBy(...).limit(k)`
    * compiles to TakeOrderedAndProject and is NOT affected — keep it.
    * Large/unbounded outputs should also keep `orderBy`: a parallel
    * range sort is the scalable path; these dump queries emit
    * hundreds-to-thousands of rows.
    */
  implicit final class PresentOps(private val df: DataFrame) extends AnyVal {
    def presentSorted(cols: org.apache.spark.sql.Column*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols: _*)
  }
}

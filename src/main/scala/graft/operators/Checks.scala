package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality VALIDATION — the expectations gate a
  * data-integration pipeline runs before publishing a load: per rule,
  * the violation count and a pass flag, as ONE lazily-composed frame.
  *
  * All row-level rules (not-null, range, custom predicate) and the
  * uniqueness rule fuse into a single aggregate over one scan;
  * referential rules each add one anti-join against their (distinct)
  * reference keys — the optimizer broadcasts small dimension key sets.
  * Nothing is collected driver-side; the report is itself a DataFrame.
  */
object Checks {

  sealed trait Rule { def name: String }

  /** `col` must never be null. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }

  /** `col` must lie in [lo, hi]. Nulls count as violations. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($col, $lo, $hi)"
  }

  /** Rows failing `predicate` (or evaluating it to null) violate. */
  final case class Satisfies(label: String, predicate: Column) extends Rule {
    def name = s"satisfies($label)"
  }

  /** The column tuple must be unique across the frame. Violations =
    * rows beyond the first of each duplicated tuple.
    */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** Every (non-null) key tuple must exist in `ref`'s `refCols`. */
  final case class ForeignKey(cols: Seq[String], ref: DataFrame,
      refCols: Seq[String], label: String) extends Rule {
    def name = s"foreign_key($label)"
  }

  /** QUARANTINE ROUTING — the dead-letter half of validation: stamp
    * every row with the names of the ROW-LEVEL rules it violates
    * (`violations`, sorted; uniqueness/FK need cross-row state and are
    * [[validate]]'s job) and a `route` of `main` or `quarantine`. A
    * pure narrow projection: the routing decision never shuffles, so
    * the gate runs at scan speed and each side streams to its sink.
    */
  def route(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val rowLevel = rules.collect {
      case r: NotNull => r.name -> col(r.col).isNull
      case r: InRange => r.name -> (col(r.col).isNull ||
        col(r.col) < r.lo || col(r.col) > r.hi)
      case r: Satisfies => r.name -> !coalesce(r.predicate, lit(false))
    }
    require(rowLevel.nonEmpty, "route needs at least one row-level rule")
    val flags = rowLevel.map { case (n, bad) =>
      when(bad, lit(n)).otherwise(lit(null).cast("string"))
    }
    df.withColumn("violations",
        array_sort(filter(array(flags: _*), v => v.isNotNull)))
      .withColumn("route",
        when(size(col("violations")) === 0, lit("main"))
          .otherwise(lit("quarantine")))
  }

  /** Validation report: one row per rule — (rule, n_violations,
    * passed), in the given rule order made deterministic by sorting on
    * the rule name downstream if needed.
    */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    val fused = rules.collect {
      case r: NotNull =>
        r.name -> sum(when(col(r.col).isNull, 1L).otherwise(0L))
      case r: InRange =>
        r.name -> sum(when(col(r.col).isNull ||
          col(r.col) < r.lo || col(r.col) > r.hi, 1L).otherwise(0L))
      case r: Satisfies =>
        r.name -> sum(when(coalesce(r.predicate, lit(false)), 0L)
          .otherwise(1L))
      case r: Unique =>
        r.name ->
          (count(lit(1)) - countDistinct(struct(r.cols.map(col): _*)))
    }
    val fusedReport: Option[DataFrame] =
      if (fused.isEmpty) None
      else {
        // Internal aliases are positional — rule names carry dots and
        // parens that col() would parse as field-access paths.
        val aggs = fused.zipWithIndex.map { case ((_, c), i) => c.as(s"__v_$i") }
        val rows = fused.zipWithIndex.map { case ((n, _), i) =>
          struct(lit(n).as("rule"), col(s"__v_$i").as("n_violations"))
        }
        Some(df.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(rows: _*)).as("r"))
          .select(col("r.rule"), col("r.n_violations")))
      }
    val fkReports = rules.collect {
      case r: ForeignKey =>
        val keyed = df.select(r.cols.map(col): _*)
          .na.drop(r.cols)
        val refKeys = r.ref.select(
          r.refCols.zip(r.cols).map { case (rc, c) => col(rc).as(c) }: _*)
          .distinct()
        keyed.join(refKeys, r.cols, "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(r.name).as("rule"), col("n_violations"))
    }
    (fusedReport.toSeq ++ fkReports)
      .reduce(_.unionByName(_))
      .withColumn("passed", col("n_violations") === 0L)
  }
}

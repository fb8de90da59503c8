package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-integration QA pass run before trusting
  * a new source: per column, row/null/exact-distinct counts and
  * stringified min/max, computed for ALL columns in ONE scan.
  *
  * The multi-column distinct counts share a single pass via Spark's
  * Expand-based rewrite (rows multiplied by #columns inside the
  * aggregate, not re-scanned); at 100 TB that is still one read of the
  * table where the naive per-column loop would be N. Min/max/null
  * counts ride the same aggregate for free.
  */
object Profile {

  /** One output row per profiled column: (column_name, n_rows, n_null,
    * n_distinct, min_str, max_str). Distinct counts are EXACT (nulls
    * excluded); min/max compare in the column's native type and are
    * stringified only for the uniform output schema.
    */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val rows = cols.map { c =>
      struct(lit(c).as("column_name"), col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_str"), col(s"__max_$c").as("max_str"))
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(rows: _*)).as("p"))
      .select(col("p.column_name"), col("p.n_rows"), col("p.n_null"),
        col("p.n_distinct"), col("p.min_str"), col("p.max_str"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked record linkage (entity resolution): find fuzzy-duplicate
  * entity names without an all-pairs scan. Two scale moves, in order:
  *
  *   1. Collapse rows to DISTINCT names first (one hash aggregate that
  *      also carries the row count). Candidate generation then runs on
  *      the ENTITY vocabulary — at 100 TB the fact table has billions
  *      of rows but the distinct-name frame is orders of magnitude
  *      smaller, and every later stage is sized by it.
  *   2. Pair candidates only WITHIN a blocking key derived from the
  *      name (last token, phonetic code, sorted-token signature, …) —
  *      the classic ER blocking step. Per-block work is quadratic in
  *      the block's DISTINCT-name count, so the block function, not
  *      the corpus size, bounds the join.
  *
  * Survivors are verified with the exact codegen'd `levenshtein` — the
  * same overgenerate-then-verify contract as the LSH and interval
  * joins (blocking may admit non-matches; the exact predicate decides).
  */
object Linkage {

  /** Fuzzy-match pairs among the distinct values of `nameCol`:
    * (name_a, name_b, lev, rows_a, rows_b) with name_a < name_b,
    * `lev <= maxLev`, both names sharing the `block(name)` key, and
    * rows_* the collapsed per-name row counts.
    */
  def blockedNamePairs(df: DataFrame, nameCol: String,
      block: Column => Column, maxLev: Int): DataFrame = {
    require(maxLev >= 0, s"maxLev must be >= 0, got $maxLev")
    val names = df
      .groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("__blk", block(col("name")))
    val a = names.select(col("__blk"), col("name").as("name_a"),
      col("n_rows").as("rows_a"))
    val b = names.select(col("__blk"), col("name").as("name_b"),
      col("n_rows").as("rows_b"))
    a.join(b, Seq("__blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("lev",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("lev") <= maxLev)
      .select("name_a", "name_b", "lev", "rows_a", "rows_b")
  }

  /** [[blockedNamePairs]]' graded twin: Jaro-Winkler similarity
    * (transposition-tolerant, prefix-weighted — the fuzzy-name scorer
    * where edit distance is too coarse) via the codegen'd native
    * expression, gated on the 4dp-ROUNDED score so the threshold
    * decision is engine-independent. Same distinct-collapse +
    * blocking scale shape.
    */
  def blockedNameSimPairs(df: DataFrame, nameCol: String,
      block: Column => Column, minJw: Double): DataFrame = {
    require(minJw >= 0.0 && minJw <= 1.0, s"minJw in [0,1], got $minJw")
    val names = df
      .groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("__blk", block(col("name")))
    val a = names.select(col("__blk"), col("name").as("name_a"),
      col("n_rows").as("rows_a"))
    val b = names.select(col("__blk"), col("name").as("name_b"),
      col("n_rows").as("rows_b"))
    a.join(b, Seq("__blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("jw", round(graft.functions.StringSimExprs
        .jaroWinkler(col("name_a"), col("name_b")), 4))
      .filter(col("jw") >= minJw)
      .select("name_a", "name_b", "jw", "rows_a", "rows_b")
  }
}

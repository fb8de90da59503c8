package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence (association-rule mining) at corpus
  * scale. The naive shape self-joins the (basket, item) table on the
  * basket key — two shuffles of the full fact table and a per-key
  * quadratic join. The scale shape instead aggregates each basket to
  * its DISTINCT item set once (one map-side-combined shuffle), then
  * generates the a<b pairs LOCALLY from each array — explosion is
  * bounded by the per-basket item-set size (cap upstream if a basket
  * can be pathological), and the pair counts reduce through a second
  * map-side-combined hash aggregate. Item counts and the basket total
  * reuse the same first-stage exchange.
  *
  * All rule metrics are exact integer ppm micro-units (count algebra,
  * `div` division) so a DuckDB oracle reproduces them bit-for-bit:
  * lift_ppm = pair_n * n_baskets * 1e6 div (n_a * n_b),
  * conf_ppm = pair_n * 1e6 div n_a (confidence of a → b).
  */
object Basket {

  /** Association stats for every item pair seen in >= `minPairN`
    * baskets: (item_a, item_b, pair_n, lift_ppm, conf_ppm) with
    * item_a < item_b. `df` holds one row per (basket, item)
    * observation; duplicates within a basket collapse.
    */
  def coOccurrence(df: DataFrame, basketCol: String, itemCol: String,
      minPairN: Long): DataFrame = {
    require(minPairN >= 1, s"minPairN must be >= 1, got $minPairN")
    val baskets = df
      .groupBy(col(basketCol).as("__bk"))
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
    val pairs = baskets
      .select(explode(expr(
        "flatten(transform(__items, (x, i) -> " +
          "transform(slice(__items, i + 2, size(__items)), " +
          "y -> struct(x AS a, y AS b))))")).as("__p"))
      .select(col("__p.a").as("item_a"), col("__p.b").as("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minPairN)
    val itemN = baskets
      .select(explode(col("__items")).as("item"))
      .groupBy("item")
      .agg(count(lit(1)).as("n"))
    val tot = baskets.agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(itemN.select(col("item").as("item_a"), col("n").as("__na")),
        Seq("item_a"))
      .join(itemN.select(col("item").as("item_b"), col("n").as("__nb")),
        Seq("item_b"))
      .crossJoin(broadcast(tot)) // one-row totals frame
      .select(col("item_a"), col("item_b"), col("pair_n"),
        // lift's numerator is pair_n x n_baskets x 1e6 — three factors
        // that overflow BIGINT at billions of baskets (ANSI would abort
        // the job). Stage it in DECIMAL(38,0): exact, fits any real
        // corpus (< 1e38), and `div` truncates identically to the
        // BIGINT path for every in-range value, so the oracle's BIGINT
        // algebra still matches bit-for-bit at test scale.
        expr("CAST(pair_n AS DECIMAL(38,0)) * n_baskets * 1000000" +
          " div (CAST(__na AS DECIMAL(38,0)) * __nb)")
          .as("lift_ppm"),
        expr("pair_n * 1000000L div __na").as("conf_ppm"))
  }
}

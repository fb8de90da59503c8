package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles.
  *
  * First line of defense at scale is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it rewrites
  * oversized sort-merge / shuffled-hash join partitions at runtime with
  * no code change. Salting is for the cases AQE cannot touch:
  * stream-static joins (AQE is disabled inside Structured Streaming
  * micro-batches), non-algebraic aggregations downstream of the join
  * (`collect_list` over a hot key lands on one reducer regardless),
  * and plans where the skewed partition is not a join at all.
  *
  * `saltedJoin` spreads a hot key over `salts` shuffle partitions: the
  * skewed side stamps a DETERMINISTIC salt (a hash of the whole row —
  * reproducible across task retries, unlike `rand()`, which under
  * retry can double-deliver rows to different salts), and the other
  * side replicates each row once per salt value. Join keys become
  * (key, salt), so the hot key's rows split across `salts` reducers at
  * the cost of a `salts`× blow-up of the OTHER side — use a small
  * factor (8-32) and only when the other side is modest (but too big
  * or too dynamic to broadcast outright).
  */
object Salt {

  private val SaltCol = "__graft_salt"

  /** Join `skewed` with `other` on `key`, spreading each key over
    * `salts` sub-keys. Supported join types: inner, left_outer,
    * left_semi, left_anti (the skewed side's rows each match exactly
    * one replica, so left-side semantics are preserved; right/full
    * would duplicate `other`-side unmatched rows and are rejected).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val jt = joinType.toLowerCase.replace("outer", "").stripSuffix("_")
    require(Seq("inner", "left", "left_semi", "left_anti", "leftsemi",
      "leftanti").contains(jt),
      s"saltedJoin supports left-preserving joins only, got $joinType")
    val salted = skewed.withColumn(SaltCol,
      pmod(xxhash64(skewed.columns.map(col): _*), lit(salts)))
    val replicated = other.withColumn(SaltCol,
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, SaltCol), joinType).drop(SaltCol)
  }

  /** Two-level aggregation for non-algebraic aggregates over skewed
    * keys: partial-aggregate per (key, salt), then merge per key. For
    * algebraic aggregates (sum/count/min/max) Spark's map-side partial
    * aggregation already bounds reducer input and this buys nothing;
    * for `collect_list`-shaped state it splits the hot key's rows over
    * `salts` reducers before the (much smaller) merge.
    *
    * `partial`: aggregate columns for the salted stage; `merge`:
    * aggregate columns combining the partial outputs per key.
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int)(
      partial: Seq[org.apache.spark.sql.Column],
      merge: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(salts > 0 && partial.nonEmpty && merge.nonEmpty)
    df.withColumn(SaltCol,
      pmod(xxhash64(df.columns.map(col): _*), lit(salts)))
      .groupBy(col(key), col(SaltCol))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Blocked record linkage: rows collapse to distinct names with counts,
  * candidates pair only within a block, and the exact levenshtein gate
  * decides survivors.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("blockedNamePairs: distinct-name collapse, block isolation, lev gate") {
    val rows = Seq(
      // "red ring" x3 and "rad ring" x1: same block (ring), lev 1.
      "red ring", "red ring", "red ring", "rad ring",
      // "blue ring": same block but lev 4 from both -> gated out at
      // maxLev 3.
      "blue ring",
      // "red bolt": lev 4 from "red ring" but DIFFERENT block -> never
      // even a candidate.
      "red bolt")
      .toDF("name")
    val got = Linkage.blockedNamePairs(rows, "name",
        n => element_at(split(n, " "), 2), maxLev = 3)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got == Map(
      ("rad ring", "red ring") -> ((1L, 1L, 3L))), s"got $got")
  }

  test("blockedNamePairs: identical pair is excluded by strict ordering") {
    val rows = Seq("a b", "a b").toDF("name")
    val got = Linkage.blockedNamePairs(rows, "name",
      n => element_at(split(n, " "), 2), maxLev = 3).count()
    assert(got == 0L)
  }
}

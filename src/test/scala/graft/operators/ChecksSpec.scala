package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Declarative data-quality validation report. */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("validate: fused row-level rules + uniqueness + FK report") {
    val df = Seq(
      (1L, Some(10L), 5.0), (2L, None, -1.0), (3L, Some(20L), 7.0),
      (3L, Some(99L), 2.0))
      .toDF("k", "fk", "v")
    val ref = Seq(10L, 20L).toDF("id")
    val got = Checks.validate(df, Seq(
      Checks.NotNull("fk"),
      Checks.InRange("v", 0.0, 6.0),
      Checks.Satisfies("v_positive", col("v") > 0),
      Checks.Unique(Seq("k")),
      Checks.ForeignKey(Seq("fk"), ref, Seq("id"), "fk_in_ref")))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("not_null(fk)") == ((1L, false)))
    assert(got("in_range(v, 0.0, 6.0)") == ((2L, false)))  // -1.0 and 7.0
    assert(got("satisfies(v_positive)") == ((1L, false)))  // -1.0
    assert(got("unique(k)") == ((1L, false)))              // k=3 twice
    assert(got("foreign_key(fk_in_ref)") == ((1L, false))) // fk=99
    // A clean frame passes everything.
    val clean = Seq((1L, Some(10L), 1.0), (2L, Some(20L), 2.0))
      .toDF("k", "fk", "v")
    val rep = Checks.validate(clean, Seq(
      Checks.NotNull("fk"), Checks.Unique(Seq("k")),
      Checks.ForeignKey(Seq("fk"), ref, Seq("id"), "fk_in_ref")))
      .as[(String, Long, Boolean)].collect()
    assert(rep.forall(_._3))
  }

  test("route stamps sorted violation reasons and splits main/quarantine") {
    val df = Seq(
      (1L, Some(10L), 5.0),   // clean
      (2L, None, -1.0),       // null fk AND out of range -> two reasons
      (3L, Some(20L), 7.0))   // out of range only
      .toDF("k", "fk", "v")
    val got = Checks.route(df, Seq(
      Checks.NotNull("fk"), Checks.InRange("v", 0.0, 6.0)))
      .select(col("k"), col("route"),
        concat_ws("|", col("violations")).as("reasons"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == (("main", "")))
    assert(got(2L) ==
      (("quarantine", "in_range(v, 0.0, 6.0)|not_null(fk)")))
    assert(got(3L) == (("quarantine", "in_range(v, 0.0, 6.0)")))
  }
}

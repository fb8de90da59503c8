package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted joins/aggregations: result parity with the unsalted plan on
  * a hot-key corpus, spread of the hot key across salt sub-keys, and
  * rejection of join types salting cannot preserve.
  */
class SaltSpec extends SparkSpec {
  import spark.implicits._

  // 10_000 rows on one hot key + a long tail, joined to a small dim.
  private lazy val facts = spark.range(12000).select(
    when($"id" < 10000, lit(1L)).otherwise($"id" % 100).as("k"),
    ($"id" * 7 % 1000).as("v"))
  private lazy val dim = spark.range(100)
    .select($"id".as("k"), concat(lit("dim"), $"id").as("name"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("saltedJoin matches the plain join for every supported type") {
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = facts.join(dim.filter($"k" % 3 === 0), Seq("k"), jt)
      val salted = Salt.saltedJoin(facts, dim.filter($"k" % 3 === 0),
        "k", salts = 8, joinType = jt)
      assert(canon(salted) == canon(plain), s"mismatch for $jt")
    }
  }

  test("saltedJoin spreads the hot key over the salt space") {
    val spread = facts
      .withColumn("s", pmod(xxhash64(facts.columns.map(col): _*), lit(8)))
      .filter($"k" === 1L).groupBy($"s").count()
      .as[(Long, Long)].collect().toMap
    assert(spread.size == 8, s"expected 8 salt buckets, got $spread")
    // No bucket may hold more than 2x its fair share of the hot key.
    assert(spread.values.max <= 2L * 10000 / 8, s"skewed spread: $spread")
  }

  test("saltedJoin rejects right/full joins") {
    intercept[IllegalArgumentException] {
      Salt.saltedJoin(facts, dim, "k", 8, "full_outer")
    }
    intercept[IllegalArgumentException] {
      Salt.saltedJoin(facts, dim, "k", 8, "right")
    }
  }

  test("saltedAgg merges collect-shaped state to the unsalted result") {
    val plain = facts.groupBy($"k")
      .agg(sort_array(collect_list($"v")).as("vs"), count(lit(1)).as("n"))
    val salted = Salt.saltedAgg(facts, "k", 8)(
      Seq(collect_list($"v").as("pvs"), count(lit(1)).as("pn")),
      Seq(sort_array(flatten(collect_list($"pvs"))).as("vs"),
        sum($"pn").as("n")))
    assert(canon(salted) == canon(plain))
  }
}

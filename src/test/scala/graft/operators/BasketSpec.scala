package graft.operators

import graft.SparkSpec

/** Market-basket co-occurrence: pair generation from per-basket item
  * sets must dedup within-basket repeats, order pairs a < b, and the
  * ppm metrics must follow the exact integer count algebra.
  */
class BasketSpec extends SparkSpec {
  import spark.implicits._

  test("coOccurrence: within-basket dedup, a<b pairs, exact ppm algebra") {
    // 4 baskets; basket 1 repeats x (must count once).
    val obs = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y"))
      .toDF("bk", "item")
    val got = Basket.coOccurrence(obs, "bk", "item", minPairN = 1L)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // n_baskets=4, n_x=3, n_y=3, n_z=1.
    // (x,y): pair_n=2, lift = 2*4*1e6 div 9 = 888888, conf = 2e6 div 3.
    // (x,z): pair_n=1, lift = 1*4*1e6 div 3 = 1333333, conf = 1e6 div 3.
    assert(got == Map(
      ("x", "y") -> ((2L, 888888L, 666666L)),
      ("x", "z") -> ((1L, 1333333L, 333333L))), s"got $got")
  }

  test("coOccurrence: minPairN floors the support") {
    val obs = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"),
      (3L, "z")).toDF("bk", "item")
    val got = Basket.coOccurrence(obs, "bk", "item", minPairN = 2L)
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set(("x", "y")), s"got ${got.toSeq}")
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d"),
    (2L, "a b c e"),
    (3L, "a b c d"),      // exact dupe of 1
    (4L, "x y z w q"))
    .toDF("doc_id", "text")

  test("exactByContent collapses identical normalized text") {
    val got = Dedup.exactByContent(docs, "doc_id", "text")
      .select("canonical_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 1L), (4L, 1L)))
  }

  test("shingleArrays builds distinct word 3-grams, drops short docs") {
    val arr = Dedup.shingleArrays(Seq((1L, "a b c d"), (2L, "a b"))
      .toDF("doc_id", "text"), "doc_id", "text", 3)
      .as[(Long, Seq[String])].collect().toMap
    assert(arr == Map(1L -> Seq("a b c", "b c d")))
  }

  test("jaccard computes exact overlap on candidate pairs") {
    // doc1 {a b c, b c d}, doc2 {a b c, b c e}: inter 1, union 3.
    val hsArr = Dedup.hashedShingleArrays(docs, "doc_id", "text", 3)
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val j = Dedup.jaccard(pairs, hsArr)
      .select("n_inter", "n_a", "n_b", "jaccard")
      .as[(Int, Int, Int, Double)].head()
    assert(j == ((1, 2, 2, 1.0 / 3.0)))
  }

  test("minhash+LSH finds exact dupes as candidates deterministically") {
    val hsArr = Dedup.hashedShingleArrays(docs, "doc_id", "text", 3)
    val cand = Dedup.lshCandidatePairs(
      Dedup.lshBands(Dedup.minhashSignatures(hsArr, 8), 8, 4))
      .as[(Long, Long)].collect().toSet
    // identical docs share every band; (1,2) shares most shingles too
    assert(cand.contains((1L, 3L)))
    assert(!cand.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash: identical docs hash identically, disjoint docs differ") {
    val sims = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sims(1L) == sims(3L))
    assert(sims(1L) != sims(4L))
    val pairs = Dedup.simhashPairs(Dedup.simhash(docs, "doc_id", "text"), 8)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 0))
  }

  test("connectedComponents labels clusters with their min doc id") {
    // {1,2,3} chained + {5,6}; 9 isolated (no pair -> no row).
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    // A longer chain still converges within the iteration budget.
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet == Set(1L) && labels.size == 9)
  }

  test("shingleBlockedPairs respects the document-frequency cap") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val all = Dedup.shingleBlockedPairs(sh, 20).as[(Long, Long)].collect().toSet
    assert(all == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // df cap 2: "a b c" occurs in 3 docs -> blocked from pairing; only
    // the pairs sharing a df<=2 shingle ("b c d" in docs 1,3) survive.
    val capped = Dedup.shingleBlockedPairs(sh, 2).as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 3L)))
  }
}

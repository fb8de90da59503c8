package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Character entropy: hand-computed values, the low-entropy gate
  * property, and order-free exactness.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("charEntropy: hand-computed micro-nat values") {
    val docs = Seq(
      (1L, "aaaa"),     // one symbol -> entropy 0
      (2L, "ab"),       // two equiprobable -> ln 2
      (3L, "aabb"))     // same distribution as doc 2
      .toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .select("doc_id", "n_chars", "n_distinct_chars", "entropy_unats")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 1L, 0L)))
    val ln2Micro = math.round(0.5 * math.log(2.0) * 1e6)  // per-char term
    assert(got(2L) == ((2L, 2L, 2L, 2 * ln2Micro)))
    assert(got(3L)._4 == got(2L)._4)  // distribution, not length
  }

  test("charEntropy separates repeated-char spam from organic text") {
    val docs = Seq(
      (1L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
      (2L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val e = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .select("doc_id", "entropy_unats").as[(Long, Long)].collect().toMap
    assert(e(1L) == 0L)
    assert(e(2L) > 2000000L)  // > 2 nats, well above any spam doc
  }

  test("unigramLogprob: rarer tokens score lower, exact micro-nat sums") {
    // Corpus: 'common' x 8, 'rare' x 1, 'mid' x 3 across docs.
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common common common common rare"),
      (3L, "mid mid mid"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogprob(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "sum_logp_unats")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val tot = 12.0
    def term(n: Long) = math.round(math.log(n / tot) * 1e6)
    assert(got(1L) == ((1L, 4L, 4 * term(8))))
    assert(got(2L) == ((2L, 5L, 4 * term(8) + term(1))))
    assert(got(3L) == ((3L, 3L, 3 * term(3))))
    // The doc holding the rare token is less probable per token.
    assert(got(2L)._3 / got(2L)._2 < got(1L)._3 / got(1L)._2)
  }

  test("bigramLogprob: conditional terms, token-salad scores lower") {
    // 'a b' always follows: p(b|a)=1 -> term 0. 'a c' once of a's two
    // continuations in doc 2's corpus-half.
    val docs = Seq((1L, "a b a b"), (2L, "a c"))
      .toDF("doc_id", "text")
    // c1: a=3, b=2, c=1; c2: 'a b'=2, 'b a'=1, 'a c'=1.
    val got = TextAnalysis.bigramLogprob(docs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "sum_logp_unats")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    def t(c2: Long, c1: Long) = math.round(math.log(c2.toDouble / c1) * 1e6)
    assert(got(1L) == ((1L, 3L, t(2, 3) + t(1, 2) + t(2, 3))))
    assert(got(2L) == ((2L, 1L, t(1, 3))))
  }

  test("charEntropy is exact under repartitioning") {
    val docs = (0 until 50)
      .map(i => (i.toLong, s"some text body number $i with shared chars"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.charEntropy(docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("bpeMerges learns the textbook low/lower merge sequence and " +
      "stops when no pairs remain") {
    // Corpus: 'low low lower'. Pair counts round 1: (l,o)=3, (o,w)=3 —
    // lexicographic tie-break picks (l,o). Then (lo,w)=3; then the
    // 1-count ties resolve (e,r) before (low,e); then (low,er); then
    // 'low' and 'lower' are single symbols -> early stop at 4 merges.
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, "text", rounds = 6)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, "l", "o", 3L),
      (2L, "lo", "w", 3L),
      (3L, "e", "r", 1L),
      (4L, "low", "er", 1L)), s"got $got")
  }

  test("readability pins the Flesch formula and clamps sentence/" +
      "syllable floors") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),
      (2L, "xyz"))   // no vowels, no punctuation -> both floors clamp
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // 6 words, 2 sentences, 6 vowel groups:
    // 206.835 - 1.015*3 - 84.6*1 = 119.19 -> 119190 milli.
    assert(got(1L) == ((1L, 6L, 2L, 6L,
      math.round((206.835 - 1.015 * 3.0 - 84.6 * 1.0) * 1000))),
      s"got $got")
    assert(got(2L)._3 == 1L && got(2L)._4 == 1L)
  }

  test("qualityBorda keeps topK per stratum, fused rank sums three " +
      "per-signal ranks") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog in spring", "s1"),
      (2L, "word word word word word", "s1"),
      (3L, "mixed tokens of the usual kind appear here", "s1"),
      (4L, "another plain doc", "s1"),
      (5L, "solo doc of source two", "s2"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.qualityBorda(docs, "doc_id", "text",
        "source", topK = 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.count(_._1 == "s1") == 2 && got.count(_._1 == "s2") == 1)
    // Borda of k docs per source: each rank in [1, k], sum of 3 ranks.
    assert(got.filter(_._1 == "s1").forall(r => r._3 >= 3 && r._3 <= 12))
    assert(got.find(_._1 == "s2").get._3 == 3L)   // only doc: all ranks 1
    // Deterministic under repartitioning.
    val again = TextAnalysis.qualityBorda(docs.repartition(7), "doc_id",
      "text", "source", topK = 2).as[(String, Long, Long)].collect().toSeq
    assert(again.sorted == got.sorted)
  }

  test("bpeMerges applies merges left-to-right greedy (aaa -> aa a)") {
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    // Round 1: (a,a) count 4 (two per word, l-t-r: positions 1-2 only
    // count... pair instances are adjacency SLOTS: a a a has two).
    val got = TextAnalysis.bpeMerges(docs, "text", rounds = 2)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    // After merging (a,a) greedily, each word is [aa, a] -> round 2
    // learns (aa, a), NOT (a, aa): the fold consumed the left pair.
    assert(got == Seq((1L, "a", "a", 4L), (2L, "aa", "a", 2L)),
      s"got $got")
  }

  test("hashingVectorize: pinned buckets, repeat-token fold, " +
      "same token -> same bucket across docs") {
    val docs = Seq((1L, "spark spark merge"), (2L, "  spark  "))
      .toDF("doc_id", "text")
    val got = TextAnalysis.hashingVectorize(docs, "doc_id", "text", 16)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val bSpark =
      graft.functions.HashFunctions.stableHash64Local("hv:spark") % 16
    val bMerge =
      graft.functions.HashFunctions.stableHash64Local("hv:merge") % 16
    val expected = Seq((1L, bSpark, 2L), (1L, bMerge, 1L),
      (2L, bSpark, 1L)).sorted
    assert(got == expected, s"got $got expected $expected")
    assert(got.forall(r => r._2 >= 0 && r._2 < 16))
  }

  test("chi2Terms: perfect separator maxes chi2 = N, uninformative " +
      "term scores 0, minDf prunes, presence not tf") {
    // 4 docs, label = id is even. 'pos' appears ONLY in good docs
    // (perfect separator, repeated -> presence must count once),
    // 'all' in every doc (chi2 0), 'rare' in one doc (df 1, pruned).
    val docs = Seq(
      (2L, "pos pos all"), (4L, "pos all rare"),
      (1L, "neg all"), (3L, "neg all"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chi2Terms(docs, "doc_id", "text",
        col("doc_id") % 2 === 0, minDf = 2L, k = 10)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // pos: a=2 b=0 c=0 d=2 -> chi2 = 4*(4-0)^2/(2*2*2*2) = 4.0 = N.
    // neg: a=0 b=2 -> also 4.0. all: a=2 b=2 -> 0.
    assert(got == Map(
      "pos" -> ((2L, 0L, 4.0)), "neg" -> ((0L, 2L, 4.0)),
      "all" -> ((2L, 2L, 0.0))), s"got $got")
  }
}

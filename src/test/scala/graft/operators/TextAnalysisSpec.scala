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
}

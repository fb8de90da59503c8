package graft.operators

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document fingerprinting (winnowing) — the rolling-hash scheme used for
  * plagiarism/near-dup detection: hash every word n-gram, slide a window
  * of `windowSize` consecutive shingle hashes, keep each window's min,
  * dedupe. A document pair sharing any fingerprint shares an n-gram run.
  *
  * Computed entirely in-row by the fused native expression
  * ([[graft.functions.NativeHashExprs.winnowFingerprints]] — one JVM
  * pass per document; bit-identical to the earlier `transform` +
  * `slice` + `array_min` builtin chain, which ran interpreted), then
  * one explode of the distinct fingerprints. No per-document window
  * shuffle — at scale every document fingerprints independently inside
  * one codegen'd projection.
  */
object TextAnalysis {

  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, windowSize: Int = 4): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.NativeHashExprs.winnowFingerprints(
          col(textCol), n, windowSize).as("fps"))
      .select(col("doc_id"), explode(col("fps")).as("fp"))

  /** Per-document CHARACTER ENTROPY — the low-entropy gate that catches
    * base64 blobs, repeated-character spam and binary-leak text that
    * token/stopword heuristics miss (Shannon entropy over the
    * character distribution, in nats).
    *
    * Shape: explode to characters, count per (doc, char) with map-side
    * combine, then a window total + final per-doc aggregate — the
    * window and the aggregate share the doc_id partitioning so it is
    * two exchanges total, with per-task memory bounded by the alphabet
    * size, never document or corpus size.
    *
    * Determinism: each character's term `-(c/n)·ln(c/n)` is rounded to
    * integer micro-nats per (doc, char) row and summed as BIGINT, so
    * the cross-row sum is exact integer math — hash-stable under any
    * aggregation order.
    */
  /** UNIGRAM LOG-PROBABILITY score — the cheap language-model quality
    * gate (a KenLM stand-in): per doc, the sum of ln p(token) under the
    * corpus's own unigram distribution, in integer micro-nats. Docs of
    * improbable tokens (OCR garbage, codes, other-language text) score
    * far below organic prose of the same length; consumers divide
    * sum/n for a length-normalized gate.
    *
    * Shape: one token-count aggregate builds the unigram table (tiny
    * vs the corpus — Heaps' law; the optimizer broadcasts it when it
    * fits, hash-joins otherwise), one 1-row total broadcast, then a
    * token→doc re-aggregation. Terms round to micro-nats per token row
    * and sum as BIGINT — exact under any order.
    */
  def unigramLogprob(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("n_t"))
    val total = vocab.agg(sum(col("n_t")).as("tot"))
    toks
      .join(vocab, Seq("token"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(log(col("n_t").cast("double") / col("tot").cast("double"))
          * lit(1e6)).cast("long").as("__term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__term")).as("sum_logp_unats"))
  }

  /** BIGRAM CONDITIONAL LOG-PROBABILITY — [[unigramLogprob]]'s sharper
    * sibling: per doc, the sum of ln p(w_i | w_{i-1}) with
    * p(w|prev) = c(prev w) / c(prev) over the corpus, in integer
    * micro-nats. Catches token-salad text (each word common, the
    * SEQUENCE improbable) that unigram scoring cannot. Bigrams come
    * from the native codegen'd `string_shingles` kernel; counts join
    * back on the bigram and its prefix (both tables Heaps'-law-small).
    */
  def bigramLogprob(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val bigrams = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.NativeHashExprs.stringShingles(col(textCol), 2))
        .as("bg"))
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val c2 = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val c1 = toks.groupBy(col("token")).agg(count(lit(1)).as("c1"))
    bigrams
      .join(c2, Seq("bg"))
      .join(c1, substring_index(col("bg"), " ", 1) === col("token"))
      .select(col("doc_id"),
        round(log(col("c2").cast("double") / col("c1").cast("double"))
          * lit(1e6)).cast("long").as("__term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__term")).as("sum_logp_unats"))
  }

  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
    val counts = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
    counts
      .withColumn("__n", sum(col("c")).over(w))
      .withColumn("__p", col("c").cast("double") / col("__n").cast("double"))
      .withColumn("__term",
        round(-col("__p") * log(col("__p")) * lit(1e6)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(max(col("__n")).as("n_chars"),
        count(lit(1)).as("n_distinct_chars"),
        sum(col("__term")).as("entropy_unats"))
  }

  /** Distributed BPE MERGE LEARNING — the tokenizer-training core
    * (Sennrich et al. 2016), `rounds` merge steps over the corpus: each
    * round counts adjacent symbol pairs across the vocabulary (weighted
    * by word frequency), picks the most frequent pair (ties: count
    * desc, then pair lexicographic — fully deterministic), and applies
    * the merge LEFT-TO-RIGHT GREEDY inside every word (true BPE
    * semantics: after `(a,a)` on `a a a` the result is `aa a`). The
    * merge application is an in-row string fold (`aggregate` over the
    * symbol array with a last-symbol sentinel check) — exactly
    * reproducible in the oracle via `list_reduce`, so the learned merge
    * table is hash-checkable.
    *
    * Scale shape: everything runs over WORD TYPES with frequencies
    * (Heaps'-law-bounded like [[graft.queries]]' vocab export, not
    * corpus-row-bounded): one token count to build the vocab, then per
    * round one pair-explode aggregate and one narrow fold projection.
    * Driver state per round is the single argmax row. Each round's
    * vocabulary persists and the previous round drops, keeping the
    * `aggregate` lineage shallow. Returns (round, sym_a, sym_b, n) —
    * the merge table in learning order; stops early if no pair remains.
    */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64,
      s"bpeMerges expects 1..64 rounds, got $rounds")
    val spark = docs.sparkSession
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val words = docs
      .select(explode(filter(split(trim(col(textCol)), " +"),
        x => x =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
    var vocab = words
      .select(filter(split(col("w"), ""), x => x =!= "").as("syms"),
        col("wn"))
      .persist(MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    try {
      for (r <- 1 to rounds if merges.size == r - 1) {
        val best = vocab
          .select(col("wn"), col("syms"))
          .filter(size(col("syms")) >= 2)
          .select(col("wn"), explode(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "i -> struct(syms[i - 1] AS x, syms[i] AS y))")).as("p"))
          .groupBy(col("p.x").as("x"), col("p.y").as("y"))
          .agg(sum(col("wn")).as("n"))
          .orderBy(col("n").desc, col("x"), col("y"))
          .limit(1).collect()
        best.headOption.foreach { row =>
          val (a, b, n) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((r.toLong, a, b, n))
          // Left-to-right greedy merge: fold symbols into a space-
          // joined accumulator; ` <a>` as the accumulator SUFFIX tests
          // "last symbol == a" exactly (a just-merged `ab` ends the
          // accumulator with ` ab`, which never suffix-matches ` a`).
          val folded = aggregate(col("syms"), lit(""),
            (acc, z) =>
              when(z === lit(b) && endswith(acc, lit(" " + a)),
                concat(acc.substr(lit(1),
                  length(acc) - lit(a.length + 1)),
                  lit(" " + a + b)))
                .otherwise(concat(acc, lit(" "), z)))
          val next = vocab
            .select(filter(split(substring(folded, 2, Int.MaxValue), " "),
              x => x =!= "").as("syms"), col("wn"))
            .persist(MEMORY_AND_DISK)
          next.count()
          vocab.unpersist()
          vocab = next
        }
      }
    } finally vocab.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("round", "sym_a", "sym_b", "n")
  }
}

package graft.operators

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
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
          val next = vocab
            .withColumn("syms", applyMerge(col("syms"), a, b))
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

  /** Apply ONE learned merge `(a, b) -> ab` to a symbol array, LEFT-
    * TO-RIGHT GREEDY (true BPE semantics): fold the symbols into a
    * space-joined accumulator; ` <a>` as the accumulator SUFFIX tests
    * "last symbol == a" exactly (a just-merged `ab` ends the
    * accumulator with ` ab`, which never suffix-matches ` a`). The
    * oracle reproduces the fold with `list_reduce`.
    */
  private def applyMerge(syms: Column, a: String, b: String): Column = {
    val folded = aggregate(syms, lit(""),
      (acc, z) =>
        when(z === lit(b) && endswith(acc, lit(" " + a)),
          concat(acc.substr(lit(1), length(acc) - lit(a.length + 1)),
            lit(" " + a + b)))
          .otherwise(concat(acc, lit(" "), z)))
    filter(split(substring(folded, 2, Int.MaxValue), " "), x => x =!= "")
  }

  /** FLESCH READING EASE (milli units): `206.835 - 1.015 * words/
    * sentences - 84.6 * syllables/words`, with sentences counted as
    * `[.!?]+` runs and syllables as vowel-group (`[aeiouy]+`) matches
    * over the lowercased text — the standard regex heuristic (words
    * without vowels count zero syllables; both floors clamp at 1 so
    * unpunctuated text still scores). Pure narrow projection, one
    * regex pass per counter; exact double ops in a fixed order,
    * rounded once — the oracle reproduces every count and the formula.
    */
  def readability(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val words = TextFunctions.tokenCount(col(textCol)).cast("long")
    val sentences = greatest(lit(1L),
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0)))
        .cast("long"))
    val syllables = greatest(lit(1L),
      size(regexp_extract_all(lower(col(textCol)), lit("[aeiouy]+"),
        lit(0))).cast("long"))
    docs.select(col(idCol).as("doc_id"), words.as("n_words"),
        sentences.as("n_sentences"), syllables.as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("flesch_milli",
        round((lit(206.835)
          - lit(1.015) * col("n_words").cast("double")
            / col("n_sentences").cast("double")
          - lit(84.6) * col("n_syllables").cast("double")
            / col("n_words").cast("double")) * lit(1000)).cast("long"))
  }

  /** BORDA-COUNT quality-signal FUSION: rank every doc within its
    * stratum by each of THREE independent quality signals — the
    * heuristic quality score, character entropy, and mean unigram
    * log-probability — sum the three ranks (lower = better on all
    * axes), and keep each stratum's `topK` by the fused rank. The
    * rank-space fusion is what makes heterogeneous signals (a [0,1]
    * score, micro-nats, log-probs) commensurable without calibration,
    * the same reason retrieval fuses with RRF.
    *
    * Exactness: the mean log-prob is offset positive before the
    * integer division (`(sum + 20e6*n) div n`) because trunc-division
    * and floor-division disagree on negatives across engines. Ranks
    * tie-break on doc_id everywhere. Windows partition by stratum —
    * the numerous-sources corpus shape, same as packSequences.
    */
  def qualityBorda(docs: DataFrame, idCol: String, textCol: String,
      stratumCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    val ent = charEntropy(docs, idCol, textCol)
      .select(col("doc_id"), col("entropy_unats"))
    val lp = unigramLogprob(docs, idCol, textCol)
      .select(col("doc_id"),
        expr("(sum_logp_unats + 20000000 * n_tokens) div n_tokens")
          .as("__alp"))
    val q = docs
      .select(col(idCol).as("doc_id"), col(stratumCol).as("__s"),
        TextFunctions.qualityScore(col(textCol)).as("__q"))
      .filter(TextFunctions.tokenCount(col(textCol)) > 0)
    def rankBy(c: Column) = row_number().over(
      Window.partitionBy(col("__s")).orderBy(c.desc, col("doc_id")))
    val fused = q.join(ent, Seq("doc_id")).join(lp, Seq("doc_id"))
      .select(col("__s"), col("doc_id"),
        (rankBy(col("__q")).cast("long") +
          rankBy(col("entropy_unats")).cast("long") +
          rankBy(col("__alp")).cast("long")).as("borda"))
    fused
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__s"))
          .orderBy(col("borda"), col("doc_id"))))
      .filter(col("__rn") <= topK)
      .select(col("__s").as(stratumCol), col("doc_id"), col("borda"))
  }

  /** BPE ENCODE + FERTILITY: learn `rounds` merges ([[bpeMerges]]'s
    * exact procedure), apply the full merge table to the word-type
    * vocabulary (`rounds` chained in-row folds — one narrow
    * projection, no extra shuffle), then report per-stratum tokenizer
    * quality: word count, BPE token count, and FERTILITY (BPE tokens
    * per word, milli) — the compression number a tokenizer is judged
    * by, per source/language. All exact integers.
    *
    * Shape: the learning pass is [[bpeMerges]]; encoding joins the
    * corpus's (stratum, word) counts against the Heaps'-bounded
    * encoded vocabulary (broadcast-friendly), one final aggregate per
    * stratum.
    */
  def bpeEncodeStats(docs: DataFrame, textCol: String, stratumCol: String,
      rounds: Int): DataFrame = {
    val merges = bpeMerges(docs, textCol, rounds)
      .orderBy(col("round"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val words = docs
      .select(col(stratumCol).as("__s"),
        explode(filter(split(trim(col(textCol)), " +"),
          x => x =!= "")).as("w"))
      .groupBy(col("__s"), col("w")).agg(count(lit(1)).as("wn"))
    val vocab0 = words.select(col("w")).distinct()
      .select(col("w"), filter(split(col("w"), ""), x => x =!= "").as("syms"))
    val encoded = merges.foldLeft(vocab0) { case (v, (a, b)) =>
      v.withColumn("syms", applyMerge(col("syms"), a, b))
    }.select(col("w"), size(col("syms")).cast("long").as("__nsym"))
    words.join(encoded, Seq("w"))
      .groupBy(col("__s"))
      .agg(sum(col("wn")).as("n_words"),
        sum(col("wn") * col("__nsym")).as("n_bpe_tokens"))
      .select(col("__s").as(stratumCol), col("n_words"),
        col("n_bpe_tokens"),
        expr("n_bpe_tokens * 1000 div n_words").as("fertility_milli"))
  }

  /** Chi-square FEATURE SELECTION: the top-`k` terms most associated
    * with a binary document label (presence-based 2x2 contingency per
    * term), the classic vocabulary-selection step in front of any
    * linear text classifier. `label` must be a deterministic Column
    * over the doc row (a heuristic gate, a stored tag) so an oracle
    * re-derives it.
    *
    * chi2 = N·(ad-bc)² / ((a+b)(c+d)(a+c)(b+d)) over per-term good/bad
    * DOC counts — integer contingency cells aggregated in one
    * map-side-combined pass over distinct (doc, term) presence rows;
    * the `minDf` floor prunes the hapax tail (both the noise and the
    * cost live there: output is df-bounded, and at corpus scale the
    * rare-term frame is what explodes). The division is pinned
    * IEEE-double in a fixed operation order, rounded to 4dp BEFORE
    * ranking so both engines break ties identically (the
    * round-then-rank convention the PageRank family uses).
    */
  def chi2Terms(docs: DataFrame, idCol: String, textCol: String,
      label: Column, minDf: Long, k: Int): DataFrame = {
    require(minDf >= 1 && k >= 1, s"need minDf >= 1, k >= 1")
    val lab = docs.select(col(idCol).as("doc_id"), label.as("__good"))
    val present = docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(
          filter(split(trim(col(textCol)), " +"), x => x =!= "")))
          .as("term"))
    val totals = lab.agg(
      sum(when(col("__good"), 1L).otherwise(0L)).as("__ng"),
      sum(when(col("__good"), 0L).otherwise(1L)).as("__nb"))
    val tc = present.join(lab, Seq("doc_id"))
      .groupBy(col("term"))
      .agg(sum(when(col("__good"), 1L).otherwise(0L)).as("a"),
        sum(when(col("__good"), 0L).otherwise(1L)).as("b"))
      .filter(col("a") + col("b") >= minDf)
    // A degenerate margin (term in every doc, or an empty class) zeroes
    // the denominator: definitionally uninformative -> chi2 = 0. The
    // guard is on the INTEGER margins (Spark's ANSI double division
    // by zero would throw, DuckDB would emit inf — both wrong here).
    val chi2 = when(
      (col("a") + col("b")) === 0 || (col("c") + col("d")) === 0 ||
        (col("a") + col("c")) === 0 || (col("b") + col("d")) === 0,
      lit(0.0)).otherwise(round(
      (col("__n").cast("double") *
        ((col("a") * col("d") - col("b") * col("c")).cast("double") *
          (col("a") * col("d") - col("b") * col("c")).cast("double"))) /
        ((col("a") + col("b")).cast("double") *
          (col("c") + col("d")).cast("double") *
          (col("a") + col("c")).cast("double") *
          (col("b") + col("d")).cast("double")), 4))
    tc.crossJoin(broadcast(totals)) // one-row class totals
      .select(col("term"), col("a"), col("b"),
        (col("__ng") - col("a")).as("c"), (col("__nb") - col("b")).as("d"),
        (col("__ng") + col("__nb")).as("__n"))
      .select(col("term"), col("a"), col("b"), chi2.as("chi2"))
      .orderBy(col("chi2").desc, col("term"))
      .limit(k)
  }

  /** Hashing-trick bag-of-words (the "hashing vectorizer"): each doc's
    * token counts folded into a FIXED `buckets`-dimensional space via
    * the portable md5 hash — the featurization step for linear quality
    * classifiers / importance models that must run identically across
    * engines and retrainings (no vocabulary dictionary to ship, no OOV
    * path). Emitted sparse as (doc_id, bucket, cnt) rows.
    *
    * Shape: one scan + explode + a map-side-combined hash aggregate;
    * output is bounded at `buckets` rows per doc regardless of corpus
    * vocabulary. Collisions are the hashing trick's documented trade
    * (buckets sized to taste); the pinned
    * [[graft.functions.HashFunctions.stableHash64]] makes every
    * engine agree on them.
    */
  def hashingVectorize(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20], got $buckets")
    docs
      .select(col(idCol).as("doc_id"),
        explode(filter(split(trim(col(textCol)), " +"), x => x =!= ""))
          .as("__tok"))
      .select(col("doc_id"),
        (graft.functions.HashFunctions.stableHash64(
          concat(lit("hv:"), col("__tok"))) % buckets).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }
}

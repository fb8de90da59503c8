package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword search scoring — Okapi BM25 over whitespace tokens.
  *
  * The reference exposes its corpus through a relational store that
  * downstream users query by content (`/root/reference/db/schema.sql`
  * `documents.text`); ranked keyword retrieval over that corpus is the
  * canonical read-side operator a training-data store serves (find the
  * docs about X, inspect what the filters kept).
  *
  * Scale shape — built for a LITERAL query (a handful of terms), the
  * interactive-search case:
  *   - per-doc term frequencies are computed IN-ROW over the token
  *     array (`size(filter(tokens, = term))` per query term) — no
  *     explode, no (doc, term) shuffle;
  *   - corpus statistics (N, avgdl, per-term document frequencies) are
  *     ONE single-row aggregate, cross-joined back (broadcast of one
  *     row);
  *   - scoring is a pure per-row projection, so the whole query is one
  *     scan + one scalar agg + `TakeOrderedAndProject` for top-k. Zero
  *     hash-shuffles at any corpus size.
  * For large/dynamic vocabularies (query-by-document), explode into the
  * (doc, term) shape instead — that variant is the classic two-agg
  * pipeline and shuffles on doc id; not needed for literal queries.
  *
  * Determinism: each term's contribution is computed with a fixed
  * per-row operation order and rounded to integer micro-units
  * (`round(x * 1e6)::bigint`); the per-doc score is the exact BIGINT
  * sum of those, so the result hashes identically regardless of
  * aggregation/evaluation order (doubles are only ever combined
  * per-row, never across rows).
  */
object Search {

  /** BM25 top-k: (doc_id, n_matched, score_1e6) for the `k` highest
    * scoring docs containing at least one query term; ties break on
    * doc_id. `k1`/`b` are the standard Okapi parameters.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.size <= 32,
      s"literal-query BM25 expects 1..32 terms, got ${queryTerms.size}")
    val toks = filter(split(trim(col(textCol)), " +"), x => x =!= "")
    def tfCol(t: String): Column = size(filter(col("__toks"), x => x === lit(t)))

    val perDoc = docs.select(col(idCol).as("doc_id"), toks.as("__toks"))
      .select(
        col("doc_id") +: size(col("__toks")).as("dl") +:
          queryTerms.zipWithIndex.map { case (t, i) => tfCol(t).as(s"__tf_$i") }: _*)

    // One row: corpus size, total token count, per-term doc frequency.
    val statCols = count(lit(1)).as("__n") +: sum(col("dl")).as("__sumdl") +:
      queryTerms.indices.map(i =>
        sum(when(col(s"__tf_$i") > 0, 1L).otherwise(0L)).as(s"__df_$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)

    // idf = ln(1 + (N - df + .5)/(df + .5)); contribution rounded to
    // micro-units per term so the cross-term sum is exact integer math.
    val contribs = queryTerms.indices.map { i =>
      val tf = col(s"__tf_$i").cast("double")
      val df = col(s"__df_$i").cast("double")
      val n = col("__n").cast("double")
      val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
      val idf = log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5)))
      val norm = tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl)
      when(col(s"__tf_$i") > 0,
        round(idf * tf * lit(k1 + 1.0) / norm * lit(1e6)).cast("long"))
        .otherwise(lit(0L))
    }
    val matched = queryTerms.indices
      .map(i => when(col(s"__tf_$i") > 0, 1).otherwise(0))
      .reduce(_ + _)

    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), matched.as("n_matched"),
        contribs.reduce(_ + _).as("score_1e6"))
      .filter(col("n_matched") > 0)
      .orderBy(col("score_1e6").desc, col("doc_id"))
      .limit(k)
  }
}

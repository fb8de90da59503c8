package graft.operators

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication operators for the training-data pipeline:
  * exact (hash-groupBy), MinHash+LSH banding, n-gram Jaccard with
  * blocking, and SimHash with band-blocked Hamming pairs.
  *
  * Scale stance (100 TB):
  *   - Exact dedup is a single hash-shuffle on the 64-hex content hash.
  *   - MinHash-LSH never materializes all pairs: docs are joined only
  *     within equal LSH-band buckets (the candidate set), then verified.
  *   - The raw shingle-blocking Jaccard join caps shingle document
  *     frequency (hot shingles are dropped from blocking, the standard
  *     guard against quadratic blow-up on stop-shingles).
  *   - All hashes are md5-derived (`HashFunctions.stableHash64`) —
  *     deterministic, seedable, and reproducible in any engine.
  *
  * Everything is pure DataFrame composition: Catalyst plans the
  * band-bucket join as a regular shuffle hash join, so AQE/skew handling
  * applies untouched.
  */
object Dedup {

  /** Exact dedup by whitespace-normalized sha256: one row per distinct
    * content hash, keeping the lowest id as the canonical representative
    * (the reference's ON CONFLICT (content_hash) DO NOTHING,
    * `/root/reference/db/postgres_store.py:84-103`).
    */
  def exactByContent(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("content_hash", HashFunctions.contentHash(col(textCol)))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** (id, shingle) pairs — distinct word n-gram shingles per document. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.shingles(col(textCol), n)).as("sh"))
      .distinct()

  /** MinHash signature columns mh0..mh{k-1}: per doc, the min seeded
    * 60-bit hash over its shingles. One shuffle (groupBy doc).
    */
  def minhashSignatures(shingleDf: DataFrame, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(i =>
      min(HashFunctions.seededHash(i, col("sh"))).as(s"mh$i"))
    shingleDf.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: signature -> (doc_id, band, band_key) rows, band_key =
    * md5 of the band's concatenated minhashes.
    */
  def lshBands(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val bandStructs = (0 until bands).map { b =>
      val cols = (0 until rows).map(r => col(s"mh${b * rows + r}"))
      struct(lit(b).as("band"), md5(concat_ws("_", cols: _*)).as("band_key"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.band_key").as("band_key"))
  }

  /** Candidate pairs (a < b) sharing at least one LSH band bucket. The
    * join key is (band, band_key) — only same-bucket docs ever meet.
    */
  def lshCandidatePairs(bands: DataFrame): DataFrame = {
    val x = bands.select(col("band"), col("band_key"), col("doc_id").as("a"))
    val y = bands.select(col("band"), col("band_key"), col("doc_id").as("b"))
    x.join(y, Seq("band", "band_key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
  }

  /** Exact Jaccard for given (a, b) candidate pairs over shingle sets. */
  def jaccard(pairs: DataFrame, shingleDf: DataFrame): DataFrame = {
    val sizes = shingleDf.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = pairs
      .join(shingleDf.select(col("doc_id").as("a"), col("sh").as("sh_a")), Seq("a"))
      .join(shingleDf.select(col("doc_id").as("b"), col("sh").as("sh_b")), Seq("b"))
      .filter(col("sh_a") === col("sh_b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("n_a")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("n_b")), Seq("b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
  }

  /** Candidate pairs by raw shingle blocking, with a document-frequency
    * cap: shingles occurring in more than `maxDf` docs don't block (else
    * a stop-shingle makes the self-join quadratic).
    */
  def shingleBlockedPairs(shingleDf: DataFrame, maxDf: Int): DataFrame = {
    val rare = shingleDf
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("sh"))
    val blocked = shingleDf.join(rare, Seq("sh"))
    blocked.select(col("sh"), col("doc_id").as("a"))
      .join(blocked.select(col("sh"), col("doc_id").as("b")), Seq("sh"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
  }

  /** 60-bit SimHash per document over frequency-weighted tokens.
    * Computed relationally: explode tokens x bit positions, sum +/-1
    * weights per (doc, bit), then fold bits back into one long.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("th", HashFunctions.stableHash64(col("tok")))
    val bits = toks
      .select(col("doc_id"), col("th"),
        explode(sequence(lit(0), lit(59))).as("b"))
      .withColumn("w",
        expr("CASE WHEN (shiftright(th, CAST(b AS INT)) & 1) = 1 THEN 1 ELSE -1 END"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("w")).as("s"))
    bits.groupBy(col("doc_id"))
      .agg(sum(expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END"))
        .as("simhash"))
  }

  /** Near-dup pairs by SimHash: block on the top 16 bits, then keep
    * pairs with Hamming distance <= maxHamming. Blocking keeps the
    * self-join linear in bucket sizes (approximate recall, like all LSH).
    */
  def simhashPairs(sims: DataFrame, maxHamming: Int): DataFrame = {
    val banded = sims.withColumn("band", expr("shiftright(simhash, 44)"))
    val x = banded.select(col("band"), col("doc_id").as("a"), col("simhash").as("sim_a"))
    val y = banded.select(col("band"), col("doc_id").as("b"), col("simhash").as("sim_b"))
    x.join(y, Seq("band"))
      .filter(col("a") < col("b"))
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
      .distinct()
  }
}

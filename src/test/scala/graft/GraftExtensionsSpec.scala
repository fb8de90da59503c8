package graft

import org.apache.spark.sql.Row

/** The SQL function surface: every native expression registered by
  * GraftExtensions must be callable from spark.sql and agree with its
  * DataFrame twin.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val registered: Unit = GraftExtensions.register(spark)

  test("SQL hashed_shingles/minhash_sig agree with the DataFrame operators") {
    registered
    Seq((1L, "a b c d"), (2L, "a b"), (3L, "x y z w v"))
      .toDF("doc_id", "text").createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT doc_id, hashed_shingles(text, 3) AS hs FROM ext_docs
        |WHERE size(hashed_shingles(text, 3)) > 0""".stripMargin)
    val df = operators.Dedup.hashedShingleArrays(
      spark.table("ext_docs"), "doc_id", "text", 3)
    assert(sql.collect().toSet.map((r: Row) =>
      (r.getLong(0), r.getSeq[Long](1))) ==
      df.collect().toSet.map((r: Row) => (r.getLong(0), r.getSeq[Long](1))))

    val sig = spark.sql(
      """SELECT doc_id, minhash_sig(hashed_shingles(text, 3), 8) AS sig
        |FROM ext_docs WHERE size(hashed_shingles(text, 3)) > 0""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(1L).length == 8 && sig(3L).length == 8)
    // Same doc -> same signature as the operator path (k = 8 prefix of
    // the same coefficient family).
    val opSig = operators.Dedup.minhashSignatures(
      operators.Dedup.hashedShingleArrays(
        spark.table("ext_docs"), "doc_id", "text", 3), 8)
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(i => r.getLong(i)).toSeq).toMap
    assert(sig == opSig)
  }

  test("SQL simhash60 and winnow_fingerprints run and null-gate correctly") {
    registered
    Seq((1L, "alpha beta gamma delta"), (2L, "   "))
      .toDF("doc_id", "text").createOrReplaceTempView("ext_docs2")
    val rows = spark.sql(
      """SELECT doc_id, simhash60(text) AS sh,
        |       winnow_fingerprints(text, 3, 4) AS fps
        |FROM ext_docs2 ORDER BY doc_id""".stripMargin).collect()
    assert(!rows(0).isNullAt(1) && rows(0).getSeq[Long](2).nonEmpty)
    assert(rows(1).isNullAt(1) && rows(1).getSeq[Long](2).isEmpty)
  }

  test("SQL capped_sorted_list caps at cap+1 and sorts") {
    registered
    Seq((1L, 5L), (1L, 3L), (1L, 4L), (2L, 9L), (2L, 8L), (2L, 7L), (2L, 6L))
      .toDF("k", "v").createOrReplaceTempView("ext_vals")
    val got = spark.sql(
      """SELECT k, capped_sorted_list(v, 3) AS vs FROM ext_vals
        |GROUP BY k ORDER BY k""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(3L, 4L, 5L))      // under cap: all, sorted
    assert(got(2L).length == 4)             // overflow: capped at cap+1
  }

  test("SQL string_shingles/phrase_count agree with the builtin forms") {
    registered
    Seq((1L, "a b a b a"), (2L, "b a"), (3L, "a"), (4L, "  x  a b  "))
      .toDF("doc_id", "text").createOrReplaceTempView("ext_docs4")
    // string_shingles == TextFunctions.shingles (duplicates, order).
    val sqlSh = spark.sql(
      "SELECT doc_id, string_shingles(text, 2) AS sh FROM ext_docs4")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val dfSh = spark.table("ext_docs4")
      .select($"doc_id", functions.TextFunctions.shingles($"text", 2).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sqlSh == dfSh)
    assert(sqlSh(1L) == Seq("a b", "b a", "a b", "b a"))  // dups kept
    assert(sqlSh(3L).isEmpty)                             // short doc
    // phrase_count: overlaps counted, whitespace-normalized tokens.
    val pc = spark.sql(
      "SELECT doc_id, phrase_count(text, 'a b') AS n FROM ext_docs4")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(pc == Map(1L -> 2, 2L -> 0, 3L -> 0, 4L -> 1))
  }

  test("non-literal size arguments are rejected with a clear error") {
    registered
    Seq((1L, "a b c")).toDF("doc_id", "text")
      .createOrReplaceTempView("ext_docs3")
    val e = intercept[Exception] {
      spark.sql("SELECT hashed_shingles(text, doc_id + 1) FROM ext_docs3")
        .collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getMessage.toLowerCase.contains("cannot resolve"))
  }
}

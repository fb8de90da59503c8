package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens and shingles") {
    val got = Seq("  a  b c d  ").toDF("t")
      .select(TextFunctions.tokens(col("t")).as("toks"),
        TextFunctions.shingles(col("t"), 3).as("sh"))
      .as[(Seq[String], Seq[String])].head()
    assert(got._1 == Seq("a", "b", "c", "d"))
    assert(got._2 == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextFunctions.shingles(col("t"), 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("token counts: whitespace vs BPE-ish") {
    val got = Seq("Hello, world 42!").toDF("t")
      .select(TextFunctions.tokenCount(col("t")),
        TextFunctions.bpeishTokenCount(col("t")))
      .as[(Int, Int)].head()
    assert(got._1 == 3)
    // Hello , world 4 2 ! -> 6
    assert(got._2 == 6)
  }

  test("langId picks marker-stopword majority with fixed tie order") {
    val cases = Seq(
      "the cat of the hat" -> "en",
      "der hund und die katze ist" -> "de",
      "le chat et la maison est" -> "fr",
      "el gato y los perros es" -> "es",
      "xyzzy plugh" -> "und")
    val got = cases.map(_._1).toDF("t")
      .select(TextFunctions.langId(col("t"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("qualityScore is in [0,1] and rewards diversity") {
    val got = Seq(
      "the quick brown fox jumps over a lazy dog and then some more of it",
      "spam spam spam spam spam spam")
      .toDF("t").select(TextFunctions.qualityScore(col("t")))
      .as[Double].collect()
    assert(got.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(0) > got(1))
  }

  test("winnowing fingerprints: identical docs agree, window min holds") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),
      (3L, "q r s t u v w x"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(docs, "doc_id", "text")
      .as[(Long, Long)].collect()
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L) == byDoc(2L))
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    // Every fingerprint is the hash of one of the doc's shingles.
    val hs = Seq("a b c d e f g h").toDF("t")
      .select(transform(TextFunctions.shingles(col("t"), 3),
        s => HashFunctions.seededHash(0, s)))
      .as[Seq[Long]].head().toSet
    assert(byDoc(1L).subsetOf(hs))
  }
}

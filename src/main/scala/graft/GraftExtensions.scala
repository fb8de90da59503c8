package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CappedSortedList, HashedShinglesExpr, MinhashSigExpr, PhraseCountExpr, Simhash60Expr, StringShinglesExpr, WinnowFingerprintsExpr}
import graft.operators.Dedup

/** SQL surface for the engine's native expressions: registered through
  * `SparkSessionExtensions` (set
  * `spark.sql.extensions=graft.GraftExtensions` on any session) or
  * post-hoc on a live session via [[GraftExtensions.register]]. SQL
  * users then get the same fused kernels the DataFrame operators use:
  *
  *   - `hashed_shingles(text, n)`         -> array<bigint>
  *   - `minhash_sig(hs, k)`               -> array<bigint> (k mins)
  *   - `simhash60(text)`                  -> bigint (null if no tokens)
  *   - `winnow_fingerprints(text, n, w)`  -> array<bigint>
  *   - `string_shingles(text, n)`         -> array<string> (dups kept)
  *   - `phrase_count(text, 'a b c')`      -> int (overlaps counted)
  *   - `capped_sorted_list(v, cap)`       -> aggregate, array<bigint>
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.entries.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def stringArg(e: Expression, fn: String, pos: Int): String = e match {
    case Literal(v: UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a string literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "")

  /** (identifier, info, builder) triples in the shape
    * `SparkSessionExtensions.injectFunction` expects.
    */
  val entries: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("hashed_shingles"),
      info("hashed_shingles",
        "hashed_shingles(text, n) - distinct 60-bit hashes of the word n-gram shingles"),
      (args: Seq[Expression]) =>
        HashedShinglesExpr(args.head, intArg(args(1), "hashed_shingles", 1))),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(hs, k) - k-hash MinHash signature of a hashed shingle array"),
      (args: Seq[Expression]) => {
        val k = intArg(args(1), "minhash_sig", 1)
        MinhashSigExpr(args.head, Dedup.minhashCoeffs(k), Dedup.MinhashPrime)
      }),
    (FunctionIdentifier("simhash60"),
      info("simhash60",
        "simhash60(text) - 60-bit frequency-weighted SimHash (null if no tokens)"),
      (args: Seq[Expression]) => Simhash60Expr(args.head)),
    (FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(text, n, w) - winnowing fingerprints over n-gram hashes, window w"),
      (args: Seq[Expression]) =>
        WinnowFingerprintsExpr(args.head,
          intArg(args(1), "winnow_fingerprints", 1),
          intArg(args(2), "winnow_fingerprints", 2))),
    (FunctionIdentifier("string_shingles"),
      info("string_shingles",
        "string_shingles(text, n) - word n-gram shingles as strings, duplicates kept"),
      (args: Seq[Expression]) =>
        StringShinglesExpr(args.head, intArg(args(1), "string_shingles", 1))),
    (FunctionIdentifier("phrase_count"),
      info("phrase_count",
        "phrase_count(text, phrase) - occurrences of the space-separated literal phrase"),
      (args: Seq[Expression]) => {
        // Mirror the tokenizer: repeated/leading/trailing spaces must
        // not yield empty phrase tokens (an empty token never matches,
        // so the count would silently be 0 for every row).
        val phrase = stringArg(args(1), "phrase_count", 1)
          .split(" ").toSeq.filter(_.nonEmpty)
        if (phrase.isEmpty)
          throw new IllegalArgumentException(
            "phrase_count: phrase must contain at least one token")
        PhraseCountExpr(args.head, phrase)
      }),
    (FunctionIdentifier("capped_sorted_list"),
      info("capped_sorted_list",
        "capped_sorted_list(v, cap) - sorted collect_list bounded at cap+1 elements"),
      (args: Seq[Expression]) =>
        CappedSortedList(args.head, intArg(args(1), "capped_sorted_list", 1))
          .toAggregateExpression()))

  /** Register the functions on a LIVE session (the extensions config
    * only applies at session construction).
    */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    entries.foreach { case (ident, inf, builder) =>
      registry.registerFunction(ident, inf, builder)
    }
  }
}

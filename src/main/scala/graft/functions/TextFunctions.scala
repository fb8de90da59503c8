package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline surface
  * (BASELINE.json north star): tokenization, shingling, token counting,
  * quality scoring, language-ID heuristics. All pure builtin
  * compositions (codegen'd, no UDFs) so every one of them is also
  * expressible as DuckDB oracle SQL.
  */
object TextFunctions {

  /** Whitespace tokens, empty strings dropped. */
  def tokens(text: Column): Column =
    filter(split(trim(text), " "), t => t =!= lit(""))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: alpha runs, single digits, single punctuation
    * marks — the standard cheap proxy for subword token counts.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeishPattern))

  /** Word n-gram shingles: ["a b c", "b c d", ...]; empty when the text
    * has fewer than n tokens. (`sequence(0, -k)` would count backwards,
    * hence the explicit guard.)
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Stopwords used by the quality score and language-ID heuristic. */
  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val DeStop: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein")
  val FrStop: Seq[String] = Seq("le", "la", "les", "et", "est", "un")
  val EsStop: Seq[String] = Seq("el", "la", "los", "y", "es", "un")

  /** Count of `toks` entries contained in `words`. */
  def stopHitsOf(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Count of tokens contained in `words`. */
  def stopHits(text: Column, words: Seq[String]): Column =
    stopHitsOf(tokens(text), words)

  /** [[qualityScore]] over an already-tokenized array. Prefer this
    * (with `toks` materialized ONCE in its own projection) whenever a
    * query computes several token metrics over the same text —
    * `tokens()` is a split+filter per call, and expression-level reuse
    * composes them to one tokenization instead of one per metric.
    * (An alias referenced more than once is non-cheap, so
    * CollapseProject keeps the materializing Project separate and the
    * split runs once per row.)
    */
  def qualityScoreOf(toks: Column): Column = {
    val n = size(toks).cast("double")
    val lenScore = least(lit(1.0), n / 32.0)
    val divScore = size(array_distinct(toks)).cast("double") / n
    val stopScore =
      least(lit(1.0), stopHitsOf(toks, EnStop).cast("double") * 8.0 / n)
    round(lenScore * 0.4 + divScore * 0.4 + stopScore * 0.2, 4)
  }

  /** Bind `arr` ONCE as a lambda variable and apply `f` to it —
    * `f(tokens(text))` would copy the tokenization subtree into every
    * reference inside `f` (3x for the quality score, 4x for lang-ID)
    * and higher-order functions are CodegenFallback, so subexpression
    * elimination never rescues it. `transform(array(arr), f)[1]`
    * evaluates `arr` exactly once per row at a one-element-array cost.
    */
  private def bindOnce(arr: Column)(f: Column => Column): Column =
    element_at(transform(array(arr), f), 1)

  /** Heuristic document quality score in [0,1], rounded to 4 dp:
    *   0.4 * length score (saturates at 32 tokens)
    * + 0.4 * lexical diversity (distinct/total tokens)
    * + 0.2 * stopword presence (saturates at 1/8 stopword ratio).
    */
  def qualityScore(text: Column): Column =
    bindOnce(tokens(text))(qualityScoreOf)

  /** [[langId]] over an already-tokenized array (see [[qualityScoreOf]]
    * for when to prefer the `Of` form).
    */
  def langIdOf(toks: Column): Column = {
    val en = stopHitsOf(toks, EnStop)
    val de = stopHitsOf(toks, DeStop)
    val fr = stopHitsOf(toks, FrStop)
    val es = stopHitsOf(toks, EsStop)
    when(en + de + fr + es === 0, lit("und"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Marker-word language-ID: count stopword hits per language, pick the
    * first maximum in fixed order (en, de, fr, es); "und" when nothing
    * matched. Deterministic and SQL-expressible.
    */
  def langId(text: Column): Column = bindOnce(tokens(text))(langIdOf)

  /** PII patterns — intentionally simple character-class regexes so
    * Java (Spark codegen) and RE2 (DuckDB oracle) agree exactly.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII scrubbing: replace emails/US-style phone numbers with typed
    * placeholder tokens. A codegen'd narrow map — the shape of every
    * redaction pass over a training corpus (swap the pattern list for
    * the jurisdiction's).
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(EmailPattern), lit("<EMAIL>")),
      lit(PhonePattern), lit("<PHONE>"))

  /** Count of email / phone matches (for redaction audits). */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))
}

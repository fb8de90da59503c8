package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Adversarial-unicode pins for the text kernels the oracles lean on
  * (SURVEY §7.4 risk 3: Python/Java/DuckDB disagree about `\s`, trim,
  * and casing on NBSP / zero-width / format chars / astral plane).
  *
  * The cross-engine conventions, established empirically against
  * DuckDB 1.x and enforced every round by the
  * `txt_unicode_kernel_parity` oracle query:
  *
  *   - Spark `trim(col)` strips ONLY ASCII space 0x20. DuckDB's bare
  *     `trim(x)` strips ALL Unicode Zs (NBSP, thin space, ideographic
  *     space, ...) — so oracle SQL that must match a Spark-side trim
  *     on arbitrary text pins the charset: `trim(x, ' ')`.
  *   - Java regex `\s` (what Spark's regexp_* compile) is the ASCII
  *     class [ \t\n\x0B\f\r]. DuckDB's RE2 `\s` is [ \t\n\f\r] — NO
  *     vertical tab. Oracle SQL that must match a Spark-side `\s`
  *     writes the explicit class `[ \t\n\x0b\f\r]` instead.
  *   - Neither engine's `\s` matches NBSP/NEL/U+2028/ZWSP/U+3000
  *     (both are ASCII-only by default) — those stay CONTENT.
  *   - md5/sha256 hash the UTF-8 encoding in both engines, astral
  *     plane included.
  *   - lower()/upper() are NOT cross-engine-safe (Java maps İ→"i̇"
  *     (2 chars) and ß→"SS" where DuckDB maps İ→i and ß→ẞ) — no
  *     oracle applies them to document text, only to ASCII enum-ish
  *     columns (`ctype`).
  *
  * This suite generates the nasty classes with ScalaCheck (fixed seed,
  * deterministic) and pins each Spark kernel to a driver-side JVM
  * reference model implementing exactly the conventions above. The
  * reference model IS the documented contract; the twin oracle query
  * pins DuckDB to the same values on frozen fixtures.
  */
class UnicodeParitySpec extends SparkSpec {
  import spark.implicits._

  // ---- reference models (the pinned conventions) ------------------

  /** Spark trim(col): ASCII space 0x20 only — NOT Java String.trim
    * (which strips every control <= 0x20).
    */
  private def strip20(s: String): String = {
    var i = 0; var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    s.substring(i, j)
  }

  private def tokensLocal(s: String): Seq[String] =
    strip20(s).split(" ", -1).toSeq.filter(_.nonEmpty)

  private def normalizeLocal(s: String): String =
    strip20(s.replaceAll("\r\n|\r", "\n").replaceAll("\\s+", " "))

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  private def sha256Local(s: String): String =
    hex(java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")))

  private def md5Local(s: String): String =
    hex(java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")))

  private def stableHash64Local(s: String): Long =
    java.lang.Long.parseLong(md5Local(s).take(15), 16)

  private def shinglesLocal(s: String, n: Int): Seq[String] = {
    val t = tokensLocal(s)
    if (t.size < n) Seq.empty else t.sliding(n).map(_.mkString(" ")).toSeq
  }

  private def bpeishLocal(s: String): Int = {
    val m = java.util.regex.Pattern
      .compile(TextFunctions.BpeishPattern).matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  // ---- nasty generators (fixed seed => reproducible) --------------

  private val NastyAtoms: Seq[String] = Seq(
    // Zs space separators: NBSP, figure, narrow NBSP, thin, ideographic
    "\u00A0", "\u2007", "\u202F", "\u2009", "\u3000",
    // line separator, paragraph separator, NEL
    "\u2028", "\u2029", "\u0085",
    // zero-width space / non-joiner / joiner, BOM/ZWNBSP
    "\u200B", "\u200C", "\u200D", "\uFEFF",
    // ASCII whitespace incl. the \x0B divergence char
    "\u000B", "\u000C", "\t", "\r", "\n", " ", "\r\n",
    // casing traps: dotted I, dotless i, sharp s, long s, sigmas
    "\u0130", "\u0131", "\u00DF", "\u017F",
    "\u03A3", "\u03C3", "\u03C2",
    // combining marks: e + acute, c + cedilla
    "e\u0301", "c\u0327",
    // astral plane: emoji, emoji + skin-tone modifier, math fraktur U
    "\uD83D\uDE00", "\uD83D\uDC4D\uD83C\uDFFD", "\uD835\uDD18",
    "a", "b", "Z", "0", "9", ".", "!", ",", "x y")

  private val nastyString: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(NastyAtoms)).map(_.mkString))

  /** 400 deterministic samples (empty + the atoms alone + seeded
    * mixtures) — valid UTF-16 throughout, no lone surrogates, so the
    * strings survive Spark/parquet round-trips byte-identically.
    */
  private val samples: Seq[String] = {
    val mixed = Gen.listOfN(360, nastyString)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(sys.error("scalacheck generation failed"))
    (Seq("") ++ NastyAtoms ++ mixed).distinct
  }

  private lazy val df = samples.zipWithIndex
    .map { case (s, i) => (i.toLong, s) }.toDF("id", "text")

  test("tokens() == strip-0x20 + split-single-space reference on " +
    "nasty unicode") {
    val got = df.select(col("id"), TextFunctions.tokens(col("text")))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == tokensLocal(s),
        s"tokens mismatch on sample $i ${s.map(_.toInt.toHexString)}")
    }
  }

  test("contentHash normalization == Java-\\s class + strip-0x20 " +
    "reference on nasty unicode") {
    val got = df.select(col("id"),
        HashFunctions.contentHash(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == sha256Local(normalizeLocal(s)),
        s"contentHash mismatch on sample $i ${s.map(_.toInt.toHexString)}")
    }
  }

  test("shingles(n=2) == token-sliding reference on nasty unicode") {
    val got = df.select(col("id"),
        TextFunctions.shingles(col("text"), 2))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == shinglesLocal(s, 2),
        s"shingles mismatch on sample $i ${s.map(_.toInt.toHexString)}")
    }
  }

  test("bpeishTokenCount == Java Pattern reference on nasty unicode") {
    val got = df.select(col("id"),
        TextFunctions.bpeishTokenCount(col("text")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == bpeishLocal(s),
        s"bpeish mismatch on sample $i ${s.map(_.toInt.toHexString)}")
    }
  }

  test("stableHash64 == md5-prefix reference on nasty unicode " +
    "(UTF-8 bytes, astral plane included)") {
    val got = df.select(col("id"),
        HashFunctions.stableHash64(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == stableHash64Local(s),
        s"stableHash64 mismatch on sample $i " +
          s"${s.map(_.toInt.toHexString)}")
    }
  }
}

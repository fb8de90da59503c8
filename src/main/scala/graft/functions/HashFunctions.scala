package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content-hash primitives mirroring the reference's dedup keys
  * (`/root/reference/utils.py:11-20`): sha1(url) as the source id and
  * sha256(whitespace-normalized text) as the content hash.
  *
  * All of these are compositions of codegen'd builtins — no UDFs — so
  * they stay inside whole-stage codegen and push through Catalyst.
  */
object HashFunctions {

  /** Whitespace normalization before content hashing, exactly the
    * reference semantics (`utils.py:15-19`): CRLF/CR -> LF, collapse all
    * whitespace runs to a single space, trim.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(text, "\r\n|\r", "\n"), "\\s+", " "))

  /** sha256 hex of normalized text — the reference's `content_hash`.
    * NULL text hashes as the empty string rather than propagating to a
    * null hash: the generational stores' redelivery no-op test is
    * `stored_hash <=> delivered_hash`-shaped only if hashes are never
    * null — a null stored hash reads as "changed" on every
    * at-least-once redelivery, appending a new generation per delivery
    * forever.
    */
  def contentHash(text: Column): Column =
    sha2(coalesce(normalizeText(text), lit("")), 256)

  /** sha1 hex of a url — the reference's `source_id` (`utils.py:11-12`). */
  def urlHash(url: Column): Column = sha1(url)

  /** Portable, deterministic 60-bit hash: first 15 hex digits of md5,
    * parsed base-16. Identical in DuckDB as
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`, which makes it the
    * seedable building block for oracle-checkable MinHash/SimHash/LSH.
    * Always non-negative (< 2^60).
    */
  def stableHash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant: hash of `seed || ':' || value`. Each seed acts as an
    * independent hash function for MinHash signatures.
    */
  def seededHash(seed: Int, c: Column): Column =
    stableHash64(concat(lit(s"$seed:"), c))

  /** Driver-side twin of [[stableHash64]] for deriving deterministic
    * constants (e.g. hyperplane weight literals) that must agree with
    * the SQL form `('0x' || substr(md5(x), 1, 15))::BIGINT`.
    */
  def stableHash64Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training corpora: emails, SSN-shaped
  * ids, IPv4 addresses, and North-American-style phone numbers, as pure
  * regex column expressions (codegen'd, map-side, no UDF).
  *
  * The patterns are deliberately conservative/deterministic — a corpus
  * scrub wants reproducible behavior over clever recall; swap in stricter
  * pattern sets per deployment via [[redactWith]]. Redaction order is
  * specificity-first (email → SSN → IP → phone) so a broader pattern never
  * consumes text a narrower one should have tagged.
  */
object Pii {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ssnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  // international prefix is one atomic optional group — a bare optional
  // separator would consume the space BEFORE a domestic number
  val phoneRe = "(\\+?\\d{1,2}[-. ])?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]\\d{4}\\b"

  /** (type, pattern, placeholder) in redaction order. */
  val defaultPatterns: Seq[(String, String, String)] = Seq(
    ("email", emailRe, "[EMAIL]"),
    ("ssn", ssnRe, "[SSN]"),
    ("ip", ipv4Re, "[IP]"),
    ("phone", phoneRe, "[PHONE]"))

  /** Per-type match counts for a text column, as (n_<type> → count). */
  def counts(c: Column): Seq[(String, Column)] =
    defaultPatterns.map { case (name, re, _) =>
      s"n_$name" -> regexp_count(c, lit(re))
    }

  /** Replace every PII match with its placeholder, specificity-first.
    * Idempotent: placeholders contain no digits or '@', so no pattern
    * matches previously redacted output.
    */
  def redact(c: Column): Column = redactWith(c, defaultPatterns)

  def redactWith(c: Column, patterns: Seq[(String, String, String)]): Column =
    patterns.foldLeft(c) { case (acc, (_, re, ph)) =>
      regexp_replace(acc, re, ph)
    }

  /** Tag a corpus: original columns plus per-type counts, `has_pii`, and
    * the redacted text as `<textCol>_redacted`.
    */
  def tag(df: DataFrame, textCol: String): DataFrame = {
    val withCounts = counts(col(textCol)).foldLeft(df) {
      case (acc, (name, expr)) => acc.withColumn(name, expr)
    }
    withCounts
      .withColumn("has_pii",
        counts(col(textCol)).map(_._1).map(col).reduce(_ + _) > 0)
      .withColumn(s"${textCol}_redacted", redact(col(textCol)))
  }
}

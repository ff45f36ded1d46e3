package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-cleaning kernels shared by the t09/t10 curation queries and unit-
  * tested directly (the corpus testdata contains no PII, so the redaction
  * path is proven on synthetic strings in TextOpsSpec).
  *
  * Every kernel has a DuckDB-SQL twin here so the Spark plan and the
  * oracle stay in lockstep — the same discipline as LlmOps.toks/shingles.
  * Patterns use only syntax with identical semantics in Java regex and
  * RE2 (character classes, bounded repetition, \b word boundary).
  */
object TextOps {

  /** Email-shaped spans. */
  val EmailRe: String = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** US-phone-shaped spans (407-555-0199 / 407.555.0199). */
  val PhoneRe: String = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Collapse runs of consecutive identical tokens to one occurrence
    * ("the the the cat" -> "the cat") — the cheap repetition scrub run
    * before dedup hashing. Pure array expression: stays in codegen. */
  def collapseRuns(tokens: Column): Column =
    filter(tokens, (x, i) => (i === 0) || (x =!= get(tokens, i - 1)))

  /** DuckDB twin of collapseRuns (DuckDB lambda indexes are 1-based;
    * t[0] is NULL so the i=1 branch short-circuits safely). */
  def collapseRunsSql(t: String): String =
    s"list_filter($t, (x, i) -> i = 1 OR x <> $t[i-1])"

  /** Replace every email/phone span with a typed placeholder. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
      lit(PhoneRe),
      lit("<PHONE>")
    )

  /** DuckDB twin of redactPii ('g': replace ALL matches — DuckDB's
    * regexp_replace is first-match-only by default, Spark's is global). */
  def redactPiiSql(c: String): String =
    s"regexp_replace(regexp_replace($c, '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g')"

  /** Count of PII spans (emails + phones) in the raw text. */
  def piiCount(text: Column): Column =
    regexp_count(text, lit(EmailRe)) + regexp_count(text, lit(PhoneRe))

  /** DuckDB twin of piiCount. */
  def piiCountSql(c: String): String =
    s"len(regexp_extract_all($c, '$EmailRe')) + len(regexp_extract_all($c, '$PhoneRe'))"

  /** IPv4-shaped spans (10.0.42.1). \d{1,3} per octet — a redactor
    * over-matches on purpose (255+ "octets" still redact); validation
    * is not its job. */
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** US-SSN-shaped national-id spans (123-45-6789). Disjoint from
    * PhoneRe by construction (3-2-4 vs 3-3-4 digit groups), so the two
    * can be counted independently on the same raw text. */
  val SsnRe: String = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** The full scrub: every email / phone / IPv4 / SSN-shaped span
    * replaced with its typed placeholder, in that fixed order (the
    * order is part of the contract — counts are taken per pattern on
    * the RAW text, then the redactions compose; the patterns are
    * pairwise disjoint on any single span, so order only matters for
    * byte-identical output, not for what gets caught). */
  def redactAllPii(text: Column): Column =
    regexp_replace(
      regexp_replace(redactPii(text), lit(Ipv4Re), lit("<IP>")),
      lit(SsnRe), lit("<ID>"))

  /** DuckDB twin of redactAllPii (same fixed order, 'g' = all matches). */
  def redactAllPiiSql(c: String): String =
    s"regexp_replace(regexp_replace(${redactPiiSql(c)}, '$Ipv4Re', '<IP>', 'g'), '$SsnRe', '<ID>', 'g')"
}

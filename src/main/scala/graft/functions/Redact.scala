package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-data pipelines: replace emails, IPv4 addresses,
  * and phone-like digit runs with stable placeholder tokens, as pure
  * scan-stage Column expressions (no UDFs, no shuffle — at 100 TB this rides
  * the same scan as the quality gates).
  *
  * Patterns are deliberately kept inside the common subset of Java regex and
  * RE2 (no lookaround, no backreferences), so an external engine (or the
  * DuckDB oracle) mirrors them verbatim. Application ORDER is part of the
  * contract: IPs before phones (an IPv4 is a phone-shaped digit run with
  * dots), emails before phones (digits in local parts).
  */
object Redact {

  val EmailToken = "[EMAIL]"
  val IpToken = "[IP]"
  val PhoneToken = "[PHONE]"

  /** RE2-safe pattern source of truth — the oracle SQL interpolates these
    * same strings. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  /** 8+ digit run allowing separators, optional leading + and/or opening
    * paren; anchored on a digit at the end so trailing punctuation
    * survives. */
  val PhonePattern = "\\+?\\(?[0-9][0-9()\\. -]{6,}[0-9]"

  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailPattern, EmailToken)

  def redactIps(text: Column): Column =
    regexp_replace(text, Ipv4Pattern, IpToken)

  def redactPhones(text: Column): Column =
    regexp_replace(text, PhonePattern, PhoneToken)

  /** Full composition in contract order: emails -> IPs -> phones. */
  def redactPii(text: Column): Column =
    redactPhones(redactIps(redactEmails(text)))

  /** Per-kind hit counts (for redaction-rate monitoring): evaluated on the
    * ORIGINAL text, mirroring the composition order's semantics (emails
    * counted before their digits could be phone-matched, IPs before phones). */
  def piiCounts(text: Column): (Column, Column, Column) = {
    val afterEmail = redactEmails(text)
    val afterIp = redactIps(afterEmail)
    (size(regexp_extract_all(text, lit(EmailPattern), lit(0))),
      size(regexp_extract_all(afterEmail, lit(Ipv4Pattern), lit(0))),
      size(regexp_extract_all(afterIp, lit(PhonePattern), lit(0))))
  }
}

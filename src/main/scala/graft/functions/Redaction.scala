package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-data curation: emails, IPv4 addresses,
  * and phone-number-shaped digit runs replaced with typed placeholder
  * tokens (the standard pre-training scrub; placeholders rather than
  * deletion so token offsets stay meaningful and the redaction is
  * auditable).
  *
  * All patterns are RE2-safe (no lookaround, no backreferences) so the
  * DuckDB oracle runs the IDENTICAL expressions; each is a single
  * codegen'd `regexp_replace` — scan-speed, shuffle-free, no UDF.
  * Order matters and is fixed: emails first (an email contains
  * digit runs a later pass could mangle), then IPv4 (dotted digits
  * would otherwise half-match the phone pattern), then phones.
  */
object Redaction {

  val emailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted quad; \b keeps it from eating into longer digit runs.
    * (Deliberately permissive on octet range — curation scrubbing
    * prefers false positives over leaked addresses.)
    */
  val ipv4Pattern: String =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** 8–15 DIGITS (the E.164 national-number range; the fixture's
    * planted "+1 555 01xx" is 8) with at most 3 separator characters
    * (space, dot, dash, parens) between consecutive digits — the
    * international phone shape, anchored on word boundaries. The
    * separator bound is load-bearing: an earlier revision counted
    * separators toward the length ("[0-9 ().-]{7,}"), which needed
    * only TWO digits total and redacted ordinary numeric prose like
    * "versions 1.0 - 2.0 - 3.0" as <PHONE>. Still RE2-safe (bounded
    * repetition, no lookaround).
    */
  val phonePattern: String =
    "\\+?\\b[0-9](?:[ ().-]{0,3}[0-9]){7,14}\\b"

  def redactEmails(c: Column): Column =
    regexp_replace(c, emailPattern, "<EMAIL>")

  def redactIpv4(c: Column): Column =
    regexp_replace(c, ipv4Pattern, "<IP>")

  def redactPhones(c: Column): Column =
    regexp_replace(c, phonePattern, "<PHONE>")

  /** The full scrub, in the documented order. */
  def redactPii(c: Column): Column =
    redactPhones(redactIpv4(redactEmails(c)))

  /** Entity-count profile from the SAME patterns the scrubber
    * applies — the audit side of redaction: how much PII-shaped
    * content does each doc carry before scrubbing (threshold-able
    * for quarantine), and did a redacted corpus really go to zero.
    * Pure codegen regexp counts, scan-speed row-local.
    */
  def entityCounts(c: Column): (Column, Column, Column) = (
    size(regexp_extract_all(c, lit(emailPattern), lit(0))),
    size(regexp_extract_all(c, lit(ipv4Pattern), lit(0))),
    size(regexp_extract_all(c, lit(phonePattern), lit(0))))
}

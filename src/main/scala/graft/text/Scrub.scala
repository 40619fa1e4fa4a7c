package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass a curation pipeline runs before
  * training (emails, IPv4 addresses, international phone numbers →
  * typed placeholder tokens). Pure per-row `Column` expressions: one
  * scan, zero shuffles, codegen'd.
  *
  * The patterns are deliberately written in the REGEX DIALECT
  * INTERSECTION of Java (Spark) and RE2 (DuckDB, Go — the engines an
  * oracle or a sibling pipeline would run): character classes, bounded
  * quantifiers, and ASCII `\b` word boundaries only — no lookarounds, no
  * backreferences, no unicode classes whose semantics differ. That keeps
  * redaction byte-reproducible across engines (oracle-checked), which
  * matters because a dedup/decontamination pass downstream of scrubbing
  * must see identical bytes no matter which system scrubbed.
  *
  * This is pattern-based PII removal — the standard first line, not a
  * guarantee: names, addresses, and free-text identifiers need an NER
  * model (out of scope offline, same boundary as the multimodal codecs).
  */
object Scrub {

  /** user@host.tld — local part, domain labels, ≥2-letter TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (no range check — redaction favors recall). */
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** International phone: + and 7–15 digits (E.164 shape). */
  val PhoneRe = "\\+[0-9]{7,15}\\b"

  /** Redact all three kinds, in a fixed order (emails first — their
    * domains would otherwise partially match the IP pattern's digits).
    */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-kind match counts (audit/reporting side of the same pass). */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(EmailRe)).cast("long").as("emails"),
    regexp_count(text, lit(Ipv4Re)).cast("long").as("ips"),
    regexp_count(text, lit(PhoneRe)).cast("long").as("phones"))
}

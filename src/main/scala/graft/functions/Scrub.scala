package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation (additive
  * beyond the reference — BASELINE.json north star): emails, US-style
  * SSNs and phone numbers, and IPv4 addresses are counted and replaced
  * with typed placeholder tokens before text ships to a training mix.
  *
  * Patterns are restricted to the regex subset Java (`java.util.regex`,
  * what Spark executes) and RE2 (what DuckDB executes) interpret
  * identically — character classes, bounded repetition, non-capturing
  * groups, `\b` word boundaries; no lookaround, no backreferences — so
  * the DuckDB oracle reproduces detection verbatim.
  *
  * Scale shape: every function here is a codegen'd string expression —
  * map-side only, no shuffle, runs inside whole-stage codegen straight
  * over the parquet scan.
  */
object Scrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val PhoneRe = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** (kind, pattern, replacement) in APPLICATION ORDER. Email first
    * (its local part may contain digit runs other rules would nibble),
    * SSN before phone (both are dash-digit shapes; SSN's 3-2-4
    * grouping must not be half-eaten as a phone tail), IP last. */
  val Rules: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "[EMAIL]"),
    ("ssn", SsnRe, "[SSN]"),
    ("phone", PhoneRe, "[PHONE]"),
    ("ip", Ipv4Re, "[IP]"))

  /** Per-kind match counts over the ORIGINAL text, as
    * (column-name, column) pairs: `n_email`, `n_ssn`, `n_phone`,
    * `n_ip`. */
  def counts(text: Column): Seq[(String, Column)] =
    Rules.map { case (kind, re, _) =>
      s"n_$kind" -> regexp_count(text, lit(re)) }

  /** Text with every rule's matches replaced by its placeholder,
    * applied in `Rules` order. Idempotent: placeholders contain no
    * digits or `@`, so a second pass matches nothing. */
  def redact(text: Column): Column =
    Rules.foldLeft(text) { case (c, (_, re, repl)) =>
      regexp_replace(c, re, repl) }
}

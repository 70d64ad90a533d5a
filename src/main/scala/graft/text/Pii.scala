package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction for training-data pipelines.
  *
  * A standard pre-training scrub pass (emails, phone numbers, IP
  * addresses, SSN-shaped ids, card-shaped numbers) expressed as pure
  * codegen'd column math: `regexp_count` per pattern and a fold of
  * `regexp_replace` for the redacted text. Linear scan, no shuffle —
  * partitions trivially at 100 TB, and the regexes run inside
  * whole-stage codegen (no UDFs).
  *
  * Pattern language is the RE2-compatible subset (character classes,
  * bounded repeats, `\b`, `\d` — no lookaround, no backreferences) so the
  * identical pattern strings run in Java regex (Spark) and RE2-style
  * engines (the DuckDB oracle) with identical semantics.
  */
object Pii {

  /** (name, pattern, replacement token), applied in this order. Most
    * specific first: the SSN/phone shapes are disjoint (3-2-4 vs 3-3-4
    * digit groups) but both must run before the bare email/IP patterns so
    * a longer match is never split by an earlier shorter one.
    */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("cc", """\b\d{16}\b""", "<CC>"),
    ("ssn", """\b\d{3}-\d{2}-\d{4}\b""", "<SSN>"),
    ("phone", """\b\d{3}-\d{3}-\d{4}\b""", "<PHONE>"),
    ("ip", """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "<IP>"),
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"))

  /** Redacted text: every pattern replaced by its token, in order. */
  def redact(text: Column): Column =
    Patterns.foldLeft(text) { case (c, (_, pat, tok)) =>
      regexp_replace(c, pat, tok)
    }

  /** Per-pattern match counts over the ORIGINAL text (the patterns are
    * mutually exclusive on any one span, so order doesn't matter here).
    */
  def counts(text: Column): Seq[(String, Column)] =
    Patterns.map { case (name, pat, _) =>
      (name, size(regexp_extract_all(text, lit(pat), lit(0))).cast("long"))
    }
}

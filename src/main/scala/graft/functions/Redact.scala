package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for corpus curation — replace personal identifiers with
  * typed placeholder tokens before a corpus is trained on (the standard
  * pre-training redaction pass; north-star extension of the text-analysis
  * family).
  *
  * The patterns deliberately use only character classes, literals and
  * bounded repetition — the regex subset on which Java's engine (Spark)
  * and RE2 (DuckDB et al.) agree exactly, so the pass is oracle-
  * verifiable. No backreferences, no lookaround (RE2 has neither), no
  * `\\w`/`\\b` (unicode-sensitivity differs between engines).
  *
  * Scale shape: `regexp_replace` is a codegen'd per-row map — no shuffle,
  * no UDF; the pass composes with any scan and keeps whole-stage codegen
  * intact.
  */
object Redact {

  /** Email addresses (conservative ASCII form). */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** NANP-style phone numbers in the +1-555-XXXX fixture shape. */
  val PhoneRe = "\\+1-555-[0-9]{4}"

  /** Both passes, emails first (a phone inside a local-part must not be
    * half-redacted).
    */
  def pii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
}

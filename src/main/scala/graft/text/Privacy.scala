package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII handling for training-data curation — the redaction / pseudonymization
  * / re-identification-audit stage every shippable corpus pipeline runs
  * before text leaves the silver layer.
  *
  * Three operators, all scan-fused projections or single partial-agg
  * shuffles (nothing here is corpus-cardinality-dependent on the driver):
  *
  *  - [[scrubPii]] / [[piiCounts]]: regex redaction of structured PII
  *    (emails, SSNs, phone numbers, IPv4) with per-class hit accounting.
  *    The patterns are deliberately restricted to the RE2 ∩
  *    `java.util.regex` common subset — character classes, bounded
  *    quantifiers, alternation, `\b` word boundaries; NO lookaround, NO
  *    backreferences — so the engine (Java regex) and any RE2-based
  *    engine (the DuckDB oracle, Go/C++ scanners) agree byte-for-byte on
  *    every match. A chained `regexp_replace` stays inside whole-stage
  *    codegen and fuses into the scan: redaction costs one pass, no
  *    shuffle, at any corpus size.
  *  - [[pseudonymize]]: deterministic keyed-hash replacement of a direct
  *    identifier (GDPR art. 4(5) pseudonymization): same input + salt →
  *    same token, so downstream joins on the pseudonym still work, but
  *    the raw identifier never leaves the projection.
  *  - [[kAnonymityAudit]]: the re-identification audit — group by the
  *    quasi-identifier tuple and flag equivalence classes smaller than
  *    k. One partial-agg shuffle on the quasi tuple; output is
  *    |distinct quasi tuples|, never |rows|.
  */
object Privacy {

  /** RFC-5322-ish mailbox, common-subset only. */
  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** US SSN NNN-NN-NNNN. */
  val ssnPat = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Intl phone in the TPC-H `c_phone` shape CC-NNN-NNN-NNNN. */
  val phonePat = "\\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Dotted-quad IPv4 (syntactic — no 0-255 range check, which would
    * need alternation both engines still share; kept simple). */
  val ipv4Pat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redaction classes in application order. More-specific shapes first:
    * the phone pattern cannot match inside an already-replaced `<SSN>`
    * token and vice versa (disjoint digit-group shapes), but emails are
    * scrubbed before IPs so a dotted-quad inside a mail domain is
    * already gone. */
  val defaultPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> emailPat, "SSN" -> ssnPat,
    "PHONE" -> phonePat, "IP" -> ipv4Pat)

  /** Redact every PII class in `patterns`, replacing each match with its
    * `<CLASS>` tag. Idempotent: tags contain no digits or `@`, so a
    * second pass matches nothing. */
  def scrubPii(text: Column,
      patterns: Seq[(String, String)] = defaultPatterns): Column =
    patterns.foldLeft(text) { case (c, (tag, pat)) =>
      regexp_replace(c, lit(pat), lit(s"<$tag>"))
    }

  /** Per-class match counts as a struct (email, ssn, phone, ip) — the
    * redaction audit trail, computed in the same scan pass as the
    * scrub. */
  def piiCounts(text: Column,
      patterns: Seq[(String, String)] = defaultPatterns): Column =
    struct(patterns.map { case (tag, pat) =>
      regexp_count(text, lit(pat)).cast("long").as(s"n_${tag.toLowerCase}")
    }: _*)

  /** Deterministic keyed pseudonym for a direct identifier: md5 over
    * `salt|value`. The salt is the re-identification secret — rotate it
    * and every pseudonym changes; hold it and the mapping is stable
    * across runs/tables (joinable). */
  def pseudonymize(id: Column, salt: String): Column =
    md5(concat_ws("|", lit(salt), id))

  /** Generalize a numeric column to its `width`-sized band (floor) — the
    * k-anonymity generalization step for continuous quasi-identifiers. */
  def band(c: Column, width: Long): Column =
    (floor(c / width) * width).cast("long")

  /** k-anonymity audit over the quasi-identifier tuple: one row per
    * equivalence class with its size and a 0/1 `meets_k` flag. Classes
    * with `meets_k = 0` re-identify to fewer than k individuals and need
    * further generalization or suppression before release. */
  def kAnonymityAudit(df: DataFrame, quasi: Seq[String], k: Long): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("meets_k",
        when(col("group_size") >= k, 1L).otherwise(0L))

  /** l-diversity audit — the complement k-anonymity misses: a class can
    * be large (meets k) yet expose everyone in it because the SENSITIVE
    * attribute is constant within it. One row per quasi-identifier
    * equivalence class with its size, the count of DISTINCT sensitive
    * values, and a 0/1 `meets_l` flag (distinct-l-diversity). Same
    * single partial-agg groupBy shape as [[kAnonymityAudit]] —
    * count_distinct keeps per-group state bounded by the sensitive
    * domain, so the audit scales with the class count, not the corpus. */
  def lDiversityAudit(df: DataFrame, quasi: Seq[String],
      sensitive: String, l: Long): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        count_distinct(col(sensitive)).as("l_distinct"))
      .withColumn("meets_l",
        when(col("l_distinct") >= l, 1L).otherwise(0L))
}

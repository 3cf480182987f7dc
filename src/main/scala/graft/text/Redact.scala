package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-corpus preparation.
  *
  * A standard pre-training cleanup stage (adjacent to the reference's
  * text sanitizers, gofast/dataops/quality.py): emails, URLs, IPv4
  * addresses and phone-like digit runs are replaced with stable
  * placeholder tokens so downstream dedup/quality stages see identical
  * text for identical content modulo PII.
  *
  * Everything is chained `regexp_replace` / `regexp_extract_all`
  * column expressions — codegen'd, no UDFs, linear per row. The
  * patterns deliberately use only syntax with identical semantics in
  * Java regex and RE2 (character classes, bounded repetition, `\b`),
  * so the DuckDB oracle can run the very same patterns.
  *
  * Order matters and is fixed: URL first (a URL may embed '@' or
  * digit runs), then email, then IPv4 (dots keep it out of the phone
  * class), then phone.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^ \\t\\n]+"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** Known false-positive class: any 8-14 char digit/dash/space run
    * matches, including ISO dates ("2024-01-01" redacts as [PHONE]).
    * That is the standard over-redaction trade-off for training
    * corpora (prefer scrubbing a date to leaking a number); pipelines
    * that must keep dates distinguishable should run [[redactDates]]
    * FIRST so they become [DATE] tokens before the phone pass. */
  val PhoneRe = "\\+?\\d[\\d\\- ]{6,12}\\d\\b"
  /** ISO-style calendar dates (YYYY-MM-DD / YYYY/MM/DD). Alternation
    * instead of a separator backreference: RE2 (the DuckDB oracle's
    * engine) has no backreferences, and mixed separators should not
    * match anyway. */
  val DateRe = "\\b\\d{4}(-\\d{2}-\\d{2}|/\\d{2}/\\d{2})\\b"

  val EmailTok = "[EMAIL]"
  val UrlTok = "[URL]"
  val Ipv4Tok = "[IP]"
  val PhoneTok = "[PHONE]"
  val DateTok = "[DATE]"

  /** Redacted text expression: URL → email → IPv4 → phone. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, UrlRe, UrlTok),
          EmailRe, EmailTok),
        Ipv4Re, Ipv4Tok),
      PhoneRe, PhoneTok)

  /** Date pass — run BEFORE [[redactPii]] when dates must survive as
    * [DATE] instead of being swallowed by the phone rule (the ISO-date
    * false positive documented on [[PhoneRe]]). */
  def redactDates(c: Column): Column =
    regexp_replace(c, DateRe, DateTok)

  /** Per-category match counts on the RAW text (order-independent,
    * counted before any replacement). */
  def piiCounts(c: Column): Seq[(String, Column)] = Seq(
    "n_url" -> size(regexp_extract_all(c, lit(UrlRe), lit(0))).cast("long"),
    "n_email" -> size(regexp_extract_all(c, lit(EmailRe), lit(0))).cast("long"),
    "n_ip" -> size(regexp_extract_all(c, lit(Ipv4Re), lit(0))).cast("long"),
    "n_phone" -> size(regexp_extract_all(c, lit(PhoneRe), lit(0))).cast("long"))

  /** One-call corpus pass: adds the redacted column and the four
    * count columns; drop the counts if only the text is wanted. */
  def redactDocuments(df: DataFrame, textCol: String,
                      outCol: String = "text_redacted"): DataFrame = {
    val withCounts = piiCounts(col(textCol)).foldLeft(df) {
      case (d, (name, e)) => d.withColumn(name, e)
    }
    withCounts.withColumn(outCol, redactPii(col(textCol)))
  }

  /** Dictionary redaction: mask every token on a term list (name
    * lists, project codenames, user handles) — the masking sibling of
    * [[Blocklist.filterClean]]'s page REMOVAL. Operates on the
    * [[TextFns.cleanText]] normalization (exact token match, no
    * substring bleed: "hashtag" survives a "hash" entry); the token
    * array is let-bound once per row; the per-token membership check
    * scans the literal term array (fine into the hundreds of terms —
    * for dictionaries in the tens of thousands swap in a broadcast
    * semi-join on exploded tokens, or an automaton pass).
    *
    * Output columns: `<textCol>_redacted` (masked, single-space
    * normalized) and `n_redacted` (tokens masked). */
  def redactTerms(df: DataFrame, textCol: String, terms: Seq[String],
                  mask: String = "[REDACTED]"): DataFrame = {
    val ts = terms.map(_.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim)
      .filter(t => t.nonEmpty && !t.contains(" ")).distinct
    require(ts.nonEmpty, "empty term dictionary: nothing to redact")
    val res = transform(
      array(TextFns.tokens(TextFns.cleanText(col(textCol)))), toks =>
        struct(
          concat_ws(" ", transform(toks,
            t => when(array_contains(lit(ts.toArray), t), lit(mask))
              .otherwise(t))).as("r"),
          size(filter(toks,
            t => array_contains(lit(ts.toArray), t))).as("n"))
    ).getItem(0)
    df.withColumn("_rr", res)
      .withColumn(s"${textCol}_redacted", col("_rr.r"))
      .withColumn("n_redacted", col("_rr.n").cast("long"))
      .drop("_rr")
  }
}

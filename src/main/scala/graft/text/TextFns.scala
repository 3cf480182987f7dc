package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string operators (SURVEY §2.9 strings; gofast/utils/text.py).
  * All are codegen'd Column expressions — no UDFs in the hot path.
  */
object TextFns {

  /** lower + strip non-alphanumerics + squeeze/trim whitespace.
    * Reference: `clean_text` (text.py:53), `normalize_text` (:188). */
  def cleanText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Whitespace tokenization → array<string>.
    * Reference: `tokenize` (text.py:740). Empty/blank input → empty
    * array (pandas `str.split` of "" is [] after dropna). */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword-piece count: alpha runs, digit runs, and single
    * other symbols — a cheap, deterministic proxy for tokenizer cost
    * used in pipeline budgeting (north-star "token counting"). */
  def subtokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** snake_case / camelCase / Capitalize-first conversions.
    * Reference: `to_snake_case` (text.py:552), `to_camel_case` (:426),
    * `capitalize_first` (:651). */
  def toSnakeCase(c: Column): Column =
    lower(regexp_replace(regexp_replace(c, "([a-z0-9])([A-Z])", "$1_$2"), "[\\s-]+", "_"))

  def toCamelCase(c: Column): Column = {
    // split on separators, capitalize each tail word, join
    val parts = split(lower(regexp_replace(c, "[\\s_-]+", " ")), " ")
    concat(element_at(parts, 1),
      concat_ws("", transform(slice(parts, 2, 1000), w => initcap(w))))
  }

  def capitalizeFirst(c: Column): Column =
    concat(upper(substring(c, 1, 1)), substring(c, 2, 1000000))

  /** URL-ish slug. Reference: `slugify` (text.py:1192). */
  def slugify(c: Column): Column =
    regexp_replace(trim(regexp_replace(lower(c), "[^a-z0-9]+", " ")), " +", "-")

  /** Truncate to n chars. Reference: `truncate` (text.py:1368). */
  def truncateText(c: Column, n: Int): Column = substring(c, 1, n)

  /** Reverse / palindrome check. Reference: text.py:1300, :1841. */
  def reverseText(c: Column): Column = reverse(c)
  def isPalindrome(c: Column): Column = reverse(c) === c

  /** Sentence split on terminal punctuation.
    * Reference: `extract_sentences` (text.py:1463). */
  def sentences(c: Column): Column = split(c, "(?<=[.!?])\\s+")

  /** base64 encode/decode. Reference: `encode_text` (text.py:1560). */
  def encodeB64(c: Column): Column = base64(c.cast("binary"))
  def decodeB64(c: Column): Column = unbase64(c).cast("string")

  /** Replace email-ish and digit runs with a salted hash prefix —
    * deterministic PII masking. Reference: `anonymize_text`
    * (text.py:1929). */
  def anonymize(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "[\\w.+-]+@[\\w-]+\\.[\\w.]+", "<email>"),
      "\\d{6,}", "<num>")

  /** Stable 128-bit content fingerprint.
    * Reference: document fingerprinting (north-star); `anonymize_text`
    * hashing (text.py:1929). */
  def fingerprint(c: Column): Column = md5(c.cast("binary"))
}

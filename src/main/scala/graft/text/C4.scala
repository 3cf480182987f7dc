package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The C4 rule-based page cleaner (Raffel et al. 2020 §2.2) as one
  * fused distributed pass — the canonical pre-filter of web-crawl
  * training corpora (north-star addition; heuristic-filter family of
  * gofast/utils/text.py:838).
  *
  * Line rules (applied per line, order-preserving):
  *  - keep only lines ending in terminal punctuation (`.`, `!`, `?`,
  *    optionally followed by one closing quote);
  *  - keep only lines with at least `minWordsPerLine` whitespace
  *    words;
  *  - drop lines containing any of `lineBanned` (case-insensitive
  *    substring — C4 uses the word "javascript").
  *
  * Page rules (applied to the whole document):
  *  - drop documents whose ORIGINAL text contains any of `docBanned`
  *    (case-insensitive substring — C4 uses "lorem ipsum" and `{`);
  *  - drop documents whose CLEANED text has fewer than `minSentences`
  *    terminal-punctuation marks (C4's three-sentence rule).
  *
  * Dropped documents are returned flagged `kept = false` rather than
  * removed — a 100 TB pipeline wants the reject stream for auditing,
  * and `.filter($"kept")` restores the C4 behavior.
  *
  * Plan shape: one posexplode over lines, pure-expression line
  * predicates, ONE groupBy(doc) reassembly, one keyed join back to
  * the document spine for empty/NULL survival — no window over raw
  * crawl order, no driver-side state.
  *
  * Output: (idCol, text_clean, n_kept, n_removed, n_sentences, kept).
  */
object C4 {

  /** `.`, `!` or `?`, optionally followed by one closing quote. */
  private val TerminalRe = "[.!?][\"']?$"

  def c4Clean(df: DataFrame, idCol: String, textCol: String,
              minWordsPerLine: Int = 3, minSentences: Int = 2,
              docBanned: Seq[String] = Seq("lorem ipsum", "{"),
              lineBanned: Seq[String] = Seq("javascript"),
              splitRe: String = "\n", joinSep: String = "\n")
      : DataFrame = {
    require(minWordsPerLine >= 0 && minSentences >= 0,
      "thresholds must be non-negative")
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), splitRe)).as(Seq("_pos", "_line")))
    val lineOk = lineBanned.foldLeft(
      trim(col("_line")).rlike(TerminalRe) &&
        size(TextFns.tokens(col("_line"))) >= minWordsPerLine) {
      (acc, b) => acc && !lower(col("_line")).contains(b.toLowerCase)
    }
    val reassembled = lines.filter(lineOk)
      .groupBy(col(idCol))
      .agg(array_join(
          transform(array_sort(collect_list(struct(col("_pos"), col("_line")))),
            x => x("_line")), joinSep).as("text_clean"),
        count(lit(1)).as("n_kept"))
    val docBad = docBanned.foldLeft(lit(false)) { (acc, b) =>
      acc || lower(coalesce(col(textCol), lit(""))).contains(b.toLowerCase)
    }
    val nLines = coalesce(size(split(col(textCol), splitRe)), lit(0))
      .cast("long")
    df.select(col(idCol), nLines.as("_ntot"), docBad.as("_bad"))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("_ntot") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        size(regexp_extract_all(coalesce(col("text_clean"), lit("")),
          lit("[.!?]"), lit(0))).cast("long").as("n_sentences"),
        col("_bad"))
      .withColumn("kept",
        col("n_sentences") >= minSentences && !col("_bad"))
      .drop("_bad")
  }
}

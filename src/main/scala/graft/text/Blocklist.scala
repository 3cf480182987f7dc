package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocklist filtering — the C4 "bad-words page removal" stage
  * (Raffel et al., "Exploring the Limits of Transfer Learning with a
  * Unified Text-to-Text Transformer", JMLR 2020, §2.2: drop any page
  * containing a word on a blocklist). Every production web-corpus
  * pipeline runs this between language-ID and dedup; it was the one
  * C4 stage `c4Clean` (C4.scala) did not cover.
  *
  * Two pattern kinds, both matched under the [[TextFns.cleanText]]
  * normalization so "Bad-Word!" and "bad word" hit the same entries:
  *  - TERMS: single tokens, exact whitespace-token match (no
  *    substring false positives — "class" never hits a 3-letter term)
  *  - PHRASES: multi-word, matched as a space-bounded substring of
  *    the cleaned text (" " padding enforces word boundaries at both
  *    ends)
  *
  * Everything is a per-row codegen'd column expression over literal
  * arrays — no join, no shuffle, no UDF; the blocklist rides into
  * every task as a plan literal (the broadcast degenerate case). Hit
  * lists preserve the blocklist's own order (a `filter` over the
  * literal array), which any engine replays identically. Cost is
  * O(tokens + |phrases|·len) per row; for blocklists in the tens of
  * thousands the escape hatch is an Aho–Corasick automaton behind a
  * native expression — not needed at the C4 list's size (~400
  * entries).
  *
  * Reference: C4 stage (paper above); gofast quality-signal family
  * (gofast/utils/text.py:838) has no blocklist primitive — this is
  * north-star coverage for the LLM-pipeline axis.
  */
object Blocklist {

  private def norm(p: String): String =
    p.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim

  /** Per-document hit report: (idCol, term_hits: array<string>,
    * phrase_hits: array<string>, blocked: boolean). Patterns are
    * normalized with the same rule as the text, so callers pass them
    * raw. Duplicate / empty patterns are dropped driver-side.
    */
  def hits(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], phrases: Seq[String] = Nil): DataFrame = {
    val ts = terms.map(norm).filter(t => t.nonEmpty && !t.contains(" ")).distinct
    val ps = phrases.map(norm).filter(_.contains(" ")).distinct
    require(ts.nonEmpty || ps.nonEmpty, "empty blocklist: nothing to match")
    val empty = array().cast("array<string>")
    // HOF lambdas re-evaluate any outer expression they reference on
    // EVERY element — a token array fed to `filter` straight off the
    // regex chain costs |blocklist| regex passes per row. Let-bind the
    // normalized text, then the (tokens, padded) pair, via the
    // one-element-array trick (the Winnow.fingerprints convention) so
    // each is computed exactly once per row.
    val hitStruct = transform(array(TextFns.cleanText(col(textCol))), c0 => {
      transform(array(struct(TextFns.tokens(c0).as("t"),
          concat(lit(" "), c0, lit(" ")).as("p"))), s0 => {
        val th =
          if (ts.isEmpty) empty
          else filter(lit(ts.toArray), t => array_contains(s0.getField("t"), t))
        val ph =
          if (ps.isEmpty) empty
          else filter(lit(ps.toArray),
            p => contains(s0.getField("p"), concat(lit(" "), p, lit(" "))))
        struct(th.as("th"), ph.as("ph"))
      }).getItem(0)
    }).getItem(0)
    // two projections, `_h` referenced four times in the outer one —
    // CollapseProject keeps them separate, so the struct is computed
    // once per row
    df.select(col(idCol), hitStruct.as("_h"))
      .select(col(idCol), col("_h.th").as("term_hits"),
        col("_h.ph").as("phrase_hits"),
        (size(col("_h.th")) + size(col("_h.ph")) > 0).as("blocked"))
  }

  /** Drop every document with at least one blocklist hit (the C4
    * behavior: page-level removal, not redaction). Keeps the input
    * schema. The predicate uses `arrays_overlap` / `contains` only —
    * the cheapest boolean form, no hit-list materialization. */
  def filterClean(df: DataFrame, textCol: String,
                  terms: Seq[String], phrases: Seq[String] = Nil): DataFrame = {
    val ts = terms.map(norm).filter(t => t.nonEmpty && !t.contains(" ")).distinct
    val ps = phrases.map(norm).filter(_.contains(" ")).distinct
    require(ts.nonEmpty || ps.nonEmpty, "empty blocklist: nothing to match")
    // same let-binding discipline as [[hits]]: normalize once, pad
    // once, then run the cheap membership checks over the bound values
    val pred = transform(array(TextFns.cleanText(col(textCol))), c0 => {
      val termHit =
        if (ts.isEmpty) lit(false)
        else arrays_overlap(TextFns.tokens(c0), lit(ts.toArray))
      val phraseHit =
        if (ps.isEmpty) lit(false)
        else transform(array(concat(lit(" "), c0, lit(" "))), p0 =>
          ps.foldLeft(lit(false)) { (acc, p) =>
            acc || contains(p0, lit(" " + p + " "))
          }).getItem(0)
      termHit || phraseHit
    }).getItem(0)
    df.filter(!pred)
  }

  /** Corpus-level audit: (pattern, kind, n_docs) — how many documents
    * each blocklist entry fires on (df per pattern, not occurrence
    * count). One explode of the per-doc DISTINCT hit lists, so the
    * exploded volume is bounded by docs × |blocklist-entries-hit|,
    * never corpus token volume. */
  def report(df: DataFrame, idCol: String, textCol: String,
             terms: Seq[String], phrases: Seq[String] = Nil): DataFrame = {
    val h = hits(df, idCol, textCol, terms, phrases)
    val t = h.select(explode(col("term_hits")).as("pattern"))
      .withColumn("kind", lit("term"))
    val p = h.select(explode(col("phrase_hits")).as("pattern"))
      .withColumn("kind", lit("phrase"))
    t.unionByName(p).groupBy("pattern", "kind")
      .agg(count(lit(1)).as("n_docs"))
  }
}

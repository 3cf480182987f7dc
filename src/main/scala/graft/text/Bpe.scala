package graft.text

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) —
  * the step past the whitespace/`token_stats` counters: a TRAINED
  * subword vocabulary, fit once and deployed everywhere (the
  * quality-classifier fit/deploy split).
  *
  * Scale design, mirroring how HF/sentencepiece actually train: the
  * corpus contributes ONE distributed pass — word counts — and the
  * merge loop runs on that BOUNDED table (top `maxWords` forms by
  * count; the loop is O(nMerges · Σ|word|), pure driver arithmetic,
  * no corpus access). Deployment broadcasts the fit-time
  * word → subwords map, so tokenizing a 100 TB corpus is a projection
  * + one broadcast lookup per word; only UNSEEN words fall back to
  * applying the merge rules directly (a per-word loop — the UDF is
  * the documented escape hatch for that genuinely iterative case,
  * and the dictionary hit is the overwhelmingly common path on the
  * corpus the model was fit on).
  *
  * Determinism: ties in the pair-count argmax break lexicographically
  * (count desc, pair asc), so the same corpus always yields the same
  * merge table — asserted in BpeSpec along with the paper's classic
  * low/lower/newest/widest fixture. Not SQL-replayable (the fit is an
  * iterative argmax, the same rows-only rationale as the KMeans
  * fits); fit + apply are ScalaTest-anchored instead. */
object Bpe {

  /** End-of-word marker (the paper's `</w>`): keeps "est" inside
    * "newest" distinct from "est" at a word boundary. */
  val Eow = "</w>"

  /** Ordered merge rules + the fit-time word segmentations. */
  final case class BpeModel(merges: Seq[(String, String)],
                            wordSegments: Map[String, Seq[String]]) {
    /** Merge priority: lower rank merges first. */
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  /** Greedy application of the merge rules to one word — always the
    * LOWEST-rank applicable merge next (the standard BPE apply
    * order), leftmost occurrence first within a rule. */
  def segmentWord(word: String, model: BpeModel): Seq[String] = {
    if (word.isEmpty) return Seq(Eow)
    var syms = word.map(_.toString).toVector :+ Eow
    var continue = true
    while (continue && syms.length > 1) {
      val candidates = syms.indices.dropRight(1)
        .flatMap { i =>
          model.ranks.get((syms(i), syms(i + 1))).map(r => (r, i))
        }
      if (candidates.isEmpty) continue = false
      else {
        val (_, i) = candidates.minBy { case (r, i0) => (r, i0) }
        syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
      }
    }
    syms
  }

  /** Fit `nMerges` merge rules from the corpus's word counts.
    * One distributed pass; the loop runs on the bounded top-`maxWords`
    * count table. */
  def fit(corpus: DataFrame, textCol: String, nMerges: Int,
          maxWords: Int = 100000): BpeModel = {
    require(nMerges > 0 && maxWords > 0, "need positive nMerges/maxWords")
    val wc = corpus
      .select(explode(TextFns.tokens(lower(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(F.count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(wc.nonEmpty, "corpus has no tokens: refusing to fit BPE")
    val words = wc.map(_._1)
    val counts = wc.map(_._2)
    val segs: Array[Vector[String]] =
      words.map(w => w.map(_.toString).toVector :+ Eow)
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      var i = 0
      while (i < segs.length) {
        val s = segs(i)
        var j = 0
        while (j < s.length - 1) {
          val p = (s(j), s(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + counts(i)
          j += 1
        }
        i += 1
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // deterministic argmax: count desc, then pair lexicographic
        val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        i = 0
        while (i < segs.length) {
          val s = segs(i)
          if (s.length > 1) {
            val out = Vector.newBuilder[String]
            var j = 0
            while (j < s.length) {
              if (j < s.length - 1 && s(j) == best._1 && s(j + 1) == best._2) {
                out += s(j) + s(j + 1)
                j += 2
              } else {
                out += s(j)
                j += 1
              }
            }
            segs(i) = out.result()
          }
          i += 1
        }
        step += 1
      }
    }
    BpeModel(merges.result(), words.zip(segs.map(_.toSeq)).toMap)
  }

  /** Tokenize a text column into subwords: posexplode the whitespace
    * words, look each up in the broadcast fit-time map (UDF fallback
    * applies the merge rules to unseen words), and reassemble the
    * subword stream per document in word order. Output:
    * (idCol, subwords array<string>, n_subwords). Empty/NULL texts
    * surface with an empty array. */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
               model: BpeModel): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val segment = udf { w: String =>
      if (w == null || w.isEmpty) Seq.empty[String]
      else bc.value.wordSegments.getOrElse(w,
        segmentWord(w, bc.value))
    }
    val exploded = df
      .select(col(idCol),
        posexplode_outer(TextFns.tokens(lower(col(textCol))))
          .as(Seq("_pos", "_w")))
      .select(col(idCol), col("_pos"), segment(col("_w")).as("_sub"))
    exploded
      .groupBy(idCol)
      .agg(coalesce(
          flatten(array_sort(collect_list(struct(col("_pos"), col("_sub"))))
            .getField("_sub")),
          array().cast("array<string>")).as("subwords"))
      .withColumn("n_subwords", size(col("subwords")))
  }
}

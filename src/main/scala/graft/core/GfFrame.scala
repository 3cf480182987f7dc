package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Fluent enrichment of DataFrame with the engine's operator surface —
  * the Spark-idiomatic analog of the reference's
  * `@make_data_dynamic(dynamize=True)` monkey-patching
  * (gofast/utils/func_utils.py:966) and the deferred `Data` builder
  * (gofast/dataops/core.py:31): `import graft.core.GfFrame._` and chain
  * `df.graft.filterExpr("age > 23").smartGroup(...)`. Zero-cost — every
  * call returns the lazy DataFrame plan Catalyst optimizes as one tree.
  */
object GfFrame {

  implicit class GraftOps(private val df: DataFrame) extends AnyVal {
    def graft: Fluent = new Fluent(df)
  }

  final class Fluent(private val df: DataFrame) extends AnyVal {
    import graft.rel._
    import graft.clean._

    def result: DataFrame = df

    // §2.2 filters
    def filterExpr(condition: String): Fluent =
      new Fluent(Filters.filterExpr(df, condition))
    def filterDf(c: String, op: String, v: Any): Fluent =
      new Fluent(Filters.filterDf(df, c, op, v))
    def popLabels(c: String, labels: Seq[Any]): Fluent =
      new Fluent(Filters.popLabels(df, c, labels))
    def selectFeatures(names: Seq[String] = Nil, regex: Option[String] = None): Fluent =
      new Fluent(Filters.selectFeatures(df, names, regex))

    // §2.4 aggregation
    def smartGroup(by: Seq[String], aggs: Seq[Column],
                   having: Option[Column] = None,
                   sortBy: Seq[Column] = Nil): Fluent =
      new Fluent(Aggregates.smartGroup(df, by, aggs, having, sortBy))

    // §2.9 cleaning
    def dropNulls(cols: Seq[String] = Nil): Fluent =
      new Fluent(Missing.dropNulls(df, cols))
    def fillConst(fills: Map[String, Any]): Fluent =
      new Fluent(Missing.fillConst(df, fills))
    def dedup(cols: Seq[String] = Nil): Fluent =
      new Fluent(Duplicates.drop(df, cols))
    def clipOutliers(column: String, qLo: Double = 0.01, qHi: Double = 0.99): Fluent = {
      val (lo, hi) = Outliers.quantileBounds(df, column, qLo, qHi)
      new Fluent(Outliers.clip(df, column, lo, hi))
    }

    // §2.7/§2.6
    def concatWith(others: DataFrame*): Fluent =
      new Fluent(SetOps.concatRows(df +: others))
    def sampleFraction(fraction: Double, seed: Long = 42L): Fluent =
      new Fluent(Sampling.sample(df, fraction, seed))

    // §2.2 index_based_selector: subset to a reference frame's key set
    def alignTo(ref: DataFrame, keyCol: String,
                onMissing: String = "ignore"): Fluent =
      new Fluent(Joins.indexBasedSelector(Seq(df), ref, keyCol,
        onMissing = onMissing).head)

    // §2.5 torres_verdin_filter: adaptive moving average per series.
    // tieCol orders rows WITHIN a duplicate timestamp — without it the
    // fold's visit order (hence the output) would depend on shuffle
    // iteration order whenever timestamps repeat
    def tvFilter(keyCol: String, tsCol: String, valueCol: String,
                 weightFactor: Double = 0.1, beta: Double = 1.0,
                 tieCol: String = null): Fluent =
      new Fluent(graft.ts.PerGroup.torresVerdin(df, keyCol, tsCol, tieCol,
        valueCol, weightFactor, beta))

    // §2.13 activation transformers (appends <col>_<name>)
    def activate(cols: Seq[String], name: String,
                 preScale: Double = 1.0, preShift: Double = 0.0): Fluent =
      new Fluent(graft.encode.Activations.transformColumns(
        df, cols, name, preScale, preShift))
    def softmaxRows(cols: Seq[String]): Fluent =
      new Fluent(graft.encode.Activations.softmaxRows(df, cols))

    // north-star text pipeline: repetition quality signals; resolve a
    // near-dup PAIR frame into duplicate clusters
    def repetitionStats(idCol: String, textCol: String): Fluent =
      new Fluent(graft.text.Quality.repetitionStats(df, idCol, textCol))
    def dedupClusters(aCol: String = "id_a", bCol: String = "id_b"): Fluent =
      new Fluent(graft.text.Dedup.connectedComponents(df, aCol, bCol))
    def dedupClustersStar(aCol: String = "id_a", bCol: String = "id_b"): Fluent =
      new Fluent(graft.text.Dedup.connectedComponentsStar(df, aCol, bCol))
    def dropNearDuplicates(idCol: String, textCol: String,
                           threshold: Double = 0.6): Fluent =
      new Fluent(graft.text.Dedup.dropNearDuplicates(df, idCol, textCol,
        threshold = threshold))
    def redactPii(textCol: String,
                  outCol: String = "text_redacted"): Fluent =
      new Fluent(graft.text.Redact.redactDocuments(df, textCol, outCol))
    def dropContaminated(eval: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, threshold: Double = 0.8,
                         includeShort: Boolean = true): Fluent =
      new Fluent(graft.text.Decontaminate.dropContaminated(df, eval,
        idCol, textCol, k, threshold, includeShort))
    def selectByTokenBudget(idCol: String, sourceCol: String,
                            scoreCol: String, tokenCol: String,
                            budgetPerSource: Long): Fluent =
      new Fluent(graft.text.Quality.selectByTokenBudget(df, idCol,
        sourceCol, scoreCol, tokenCol, budgetPerSource))
    def selectByTokenBudgetBucketed(idCol: String, sourceCol: String,
                                    scoreCol: String, tokenCol: String,
                                    budgetPerSource: Long,
                                    bucketExpr: Column): Fluent =
      new Fluent(graft.text.Quality.selectByTokenBudgetBucketed(df, idCol,
        sourceCol, scoreCol, tokenCol, budgetPerSource, bucketExpr))
    def selectByTokenBudgetGlobal(idCol: String, sourceCol: String,
                                  scoreCol: String, tokenCol: String,
                                  totalBudget: Long,
                                  weights: Map[String, Double],
                                  caps: Map[String, Long] = Map.empty): Fluent =
      new Fluent(graft.text.Quality.selectByTokenBudgetGlobal(df, idCol,
        sourceCol, scoreCol, tokenCol, totalBudget, weights, caps))
    def selectByTokenBudgetTemperature(idCol: String, sourceCol: String,
                                       scoreCol: String, tokenCol: String,
                                       totalBudget: Long, alpha: Double,
                                       caps: Map[String, Long] = Map.empty)
        : Fluent =
      new Fluent(graft.text.Quality.selectByTokenBudgetTemperature(df,
        idCol, sourceCol, scoreCol, tokenCol, totalBudget, alpha, caps))
    def selectByTokenBudgetUniMax(idCol: String, sourceCol: String,
                                  scoreCol: String, tokenCol: String,
                                  totalBudget: Long,
                                  maxEpochs: Double): Fluent =
      new Fluent(graft.text.Quality.selectByTokenBudgetUniMax(df,
        idCol, sourceCol, scoreCol, tokenCol, totalBudget, maxEpochs))
    def chunkByTokens(idCol: String, textCol: String,
                      chunkTokens: Int = 32, overlapTokens: Int = 8): Fluent =
      new Fluent(graft.text.Chunk.chunkByTokens(df, idCol, textCol,
        chunkTokens, overlapTokens))
    def dedupLinesAcrossCorpus(idCol: String, textCol: String, minDf: Long,
                               splitRe: String = "\n",
                               joinSep: String = "\n"): Fluent =
      new Fluent(graft.text.Chunk.dedupLinesAcrossCorpus(df, idCol, textCol,
        minDf, splitRe, joinSep))
    def dedupLinesByDocFrac(idCol: String, textCol: String,
                            num: Int, den: Int, splitRe: String = "\n",
                            joinSep: String = "\n"): Fluent =
      new Fluent(graft.text.Chunk.dedupLinesByDocFrac(df, idCol, textCol,
        num, den, splitRe, joinSep))
    def dedupByUrl(idCol: String, urlCol: String): Fluent =
      new Fluent(graft.text.Urls.dedupByUrl(df, idCol, urlCol))
    def maskDuplicateSpans(idCol: String, textCol: String,
                           k: Int = 50, minOccur: Int = 2): Fluent =
      new Fluent(graft.text.Chunk.maskDuplicateSpans(df, idCol, textCol,
        k, minOccur))
    def chunkBySentences(idCol: String, textCol: String,
                         budgetTokens: Int): Fluent =
      new Fluent(graft.text.Chunk.chunkBySentences(df, idCol, textCol,
        budgetTokens))
    def c4Clean(idCol: String, textCol: String,
                minWordsPerLine: Int = 3, minSentences: Int = 2): Fluent =
      new Fluent(graft.text.C4.c4Clean(df, idCol, textCol,
        minWordsPerLine, minSentences))
    def gopherRules(idCol: String, textCol: String,
                    minWords: Int = 50, maxWords: Int = 100000): Fluent =
      new Fluent(graft.text.Quality.gopherRules(df, idCol, textCol,
        minWords, maxWords))
    def dupNgramCharFrac(idCol: String, textCol: String, n: Int,
                         minOccur: Int = 2): Fluent =
      new Fluent(graft.text.Quality.dupNgramCharFrac(df, idCol, textCol,
        n, minOccur))
    def packShards(idCol: String, tokenCol: String, shardTokens: Long,
                   bucketExpr: org.apache.spark.sql.Column): Fluent =
      new Fluent(graft.text.Shards.packShards(df, idCol, tokenCol,
        shardTokens, bucketExpr))
    def shuffleOrder(idCol: String, seed: Long): Fluent =
      new Fluent(graft.text.Shards.shuffleOrder(df, idCol, seed))
    /** Semantic decontamination of this frame against an eval set. */
    def dropContaminatedVectors(evalDf: DataFrame, idCol: String,
                                vecCol: String, evalVecCol: String,
                                threshold: Double): Fluent =
      new Fluent(graft.ml.Similarity.dropContaminatedVectors(df, evalDf,
        idCol, vecCol, evalVecCol, threshold))
    def scoreByUnigram(refCorpus: DataFrame, idCol: String, textCol: String,
                       alpha: Double = 0.5): Fluent =
      new Fluent(graft.text.LangModel.scoreByUnigram(df, refCorpus,
        idCol, textCol, alpha))
    def scoreByBigram(refCorpus: DataFrame, idCol: String, textCol: String,
                      alpha: Double = 0.5): Fluent =
      new Fluent(graft.text.LangModel.scoreByBigram(df, refCorpus,
        idCol, textCol, alpha))
    def scoreByKneserNey(refCorpus: DataFrame, idCol: String,
                         textCol: String, discount: Double = 0.75,
                         alpha: Double = 0.5): Fluent =
      new Fluent(graft.text.LangModel.scoreByKneserNey(df, refCorpus,
        idCol, textCol, discount, alpha))
    def scoreByKneserNey3(refCorpus: DataFrame, idCol: String,
                          textCol: String, discount: Double = 0.75,
                          alpha: Double = 0.5): Fluent =
      new Fluent(graft.text.LangModel.scoreByKneserNey3(df, refCorpus,
        idCol, textCol, discount, alpha))
    def scoreByStupidBackoff(refCorpus: DataFrame, idCol: String,
                             textCol: String, lambda: Double = 0.4,
                             alpha: Double = 0.5): Fluent =
      new Fluent(graft.text.LangModel.scoreByStupidBackoff(df, refCorpus,
        idCol, textCol, lambda, alpha))
    /** Generation-eval metrics of this frame as the CANDIDATE side. */
    def rougeN(refs: DataFrame, idCol: String, candCol: String,
               refCol: String, maxN: Int = 2): Fluent =
      new Fluent(graft.text.EvalMetrics.rougeN(df, refs, idCol,
        candCol, refCol, maxN))
    def rougeL(refs: DataFrame, idCol: String, candCol: String,
               refCol: String): Fluent =
      new Fluent(graft.text.EvalMetrics.rougeL(df, refs, idCol,
        candCol, refCol))
    def corpusBleu(refs: DataFrame, idCol: String, candCol: String,
                   refCol: String, maxN: Int = 4): Fluent =
      new Fluent(graft.text.EvalMetrics.corpusBleu(df, refs, idCol,
        candCol, refCol, maxN))
    def chrF(refs: DataFrame, idCol: String, candCol: String,
             refCol: String, maxN: Int = 6, beta: Double = 2.0): Fluent =
      new Fluent(graft.text.EvalMetrics.chrF(df, refs, idCol,
        candCol, refCol, maxN, beta))
    def extractiveSummary(idCol: String, textCol: String,
                          minTokenLen: Int = 2): Fluent =
      new Fluent(graft.text.Keywords.extractiveSummary(df, idCol,
        textCol, minTokenLen))
    def dropSeenDocs(refCorpus: DataFrame, textCol: String): Fluent =
      new Fluent(graft.text.Snapshot.dropSeenDocs(df, refCorpus, textCol))
    def dropSeenNearDups(refCorpus: DataFrame, idCol: String,
                         textCol: String, threshold: Double = 0.6): Fluent =
      new Fluent(graft.text.Snapshot.dropSeenNearDups(df, refCorpus,
        idCol, textCol, threshold = threshold))
    /** BM25 retrieval over this frame as the document corpus. */
    def bm25TopK(queries: DataFrame, docId: String, textCol: String,
                 queryId: String, queryText: String, k: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75): Fluent =
      new Fluent(graft.text.Retrieval.bm25TopK(df, queries, docId,
        textCol, queryId, queryText, k, k1, b))
    /** RRF-fuse this ranking with others (all shaped query/doc/rank). */
    def rrfFuseWith(others: Seq[DataFrame], queryCol: String = "query",
                    docCol: String = "doc", rankCol: String = "rank",
                    c: Int = 60, k: Int = 10): Fluent =
      new Fluent(graft.text.Retrieval.rrfFuse(df +: others, queryCol,
        docCol, rankCol, c, k))
    /** Exact phrase search over this frame as the corpus. */
    def phraseSearch(docId: String, textCol: String,
                     phrases: Seq[String]): Fluent =
      new Fluent(graft.text.Retrieval.phraseSearch(df, docId, textCol,
        phrases))
    /** Drop pages with any blocklist hit (the C4 bad-words stage). */
    def dropBlocklisted(textCol: String, terms: Seq[String],
                        phrases: Seq[String] = Nil): Fluent =
      new Fluent(graft.text.Blocklist.filterClean(df, textCol, terms,
        phrases))
    /** Mask every token on a term dictionary (name-list redaction). */
    def redactTerms(textCol: String, terms: Seq[String],
                    mask: String = "[REDACTED]"): Fluent =
      new Fluent(graft.text.Redact.redactTerms(df, textCol, terms, mask))
    /** Per-document blocklist hit report. */
    def blocklistHits(idCol: String, textCol: String, terms: Seq[String],
                      phrases: Seq[String] = Nil): Fluent =
      new Fluent(graft.text.Blocklist.hits(df, idCol, textCol, terms,
        phrases))
    /** Winnowing near-dup pairs within this frame (MOSS fingerprints). */
    def winnowPairs(idCol: String, textCol: String, k: Int = 5,
                    w: Int = 4, minShared: Int = 2): Fluent =
      new Fluent(graft.text.Winnow.pairs(df, idCol, textCol, k, w,
        minShared))
    /** Winnowing overlap of this frame against a fixed reference set. */
    def winnowCrossPairs(ref: DataFrame, idCol: String, textCol: String,
                         k: Int = 5, w: Int = 4,
                         minShared: Int = 2): Fluent =
      new Fluent(graft.text.Winnow.crossPairs(df, ref, idCol, textCol,
        k, w, minShared))
    /** KL/JS unigram divergence of this frame vs another corpus. */
    def corpusDivergence(other: DataFrame, textCol: String,
                         otherTextCol: String,
                         alpha: Double = 0.5): Fluent =
      new Fluent(graft.text.CorpusStats.corpusDivergence(df, other,
        textCol, otherTextCol, alpha))
    /** Rank-statistic ROC-AUC of a score column against a label. */
    def rocAuc(scoreCol: String, labelCol: String,
               bins: Option[Int] = None): Fluent =
      new Fluent(graft.ml.ClassifierEval.rocAuc(df, scoreCol, labelCol,
        bins))
    /** Precision-recall curve at every distinct score threshold. */
    def prCurve(scoreCol: String, labelCol: String,
                bins: Option[Int] = None): Fluent =
      new Fluent(graft.ml.ClassifierEval.prCurve(df, scoreCol, labelCol,
        bins))
    /** Zipf's-law fit over this frame's token frequencies. */
    def zipfFit(textCol: String, minFreq: Long = 1L): Fluent =
      new Fluent(graft.text.CorpusStats.zipfFit(df, textCol, minFreq))
    /** Heaps'-law vocabulary-growth fit over this frame. */
    def heapsFit(idCol: String, textCol: String): Fluent =
      new Fluent(graft.text.CorpusStats.heapsFit(df, idCol, textCol))
    /** Type-token ratio per group slice. */
    def typeTokenRatio(groupCol: String, textCol: String): Fluent =
      new Fluent(graft.text.CorpusStats.typeTokenRatio(df, groupCol,
        textCol))
    /** Ordered conversion funnel over this frame's events. */
    def funnel(userCol: String, typeCol: String, tsCol: String,
               steps: Seq[String]): Fluent =
      new Fluent(graft.ts.EventAnalytics.funnel(df, userCol, typeCol,
        tsCol, steps))
    /** Cohort retention matrix off first-seen period. */
    def cohortRetention(userCol: String, tsCol: String,
                        period: String = "week"): Fluent =
      new Fluent(graft.ts.EventAnalytics.cohortRetention(df, userCol,
        tsCol, period))
    /** First-order event-type transition matrix per user. */
    def eventTransitions(userCol: String, typeCol: String, tsCol: String,
                         tieCols: Seq[String] = Nil): Fluent =
      new Fluent(graft.ts.EventAnalytics.eventTransitions(df, userCol,
        typeCol, tsCol, tieCols))
    /** Time-to-convert distribution between two funnel steps. */
    def conversionTime(userCol: String, typeCol: String, tsCol: String,
                       fromStep: String, toStep: String): Fluent =
      new Fluent(graft.ts.EventAnalytics.conversionTime(df, userCol,
        typeCol, tsCol, fromStep, toStep))
    /** Approximate heavy hitters: Misra-Gries candidates + one
      * count-min estimate pass — no exact-count shuffle. */
    def heavyHittersApprox(column: String, minCount: Long,
                           capacity: Int = 256): Fluent =
      new Fluent(graft.rel.Sketches.heavyHittersApprox(df, column,
        minCount, capacity))
    /** Population Stability Index of `other`'s values against THIS
      * frame as the reference (bin edges = this frame's quantiles). */
    def psiVs(other: DataFrame, valueCol: String, bins: Int = 10): Fluent =
      new Fluent(graft.stats.DataAudit.psi(df, other, valueCol, bins))
    /** Flesch-Kincaid readability per document. */
    def readability(idCol: String, textCol: String): Fluent =
      new Fluent(graft.text.Quality.readability(df, idCol, textCol))
    /** Max drawdown per ordered series. */
    def maxDrawdown(partitionCols: Seq[String], valueCol: String,
                    orderCol: String, tieCols: Seq[String] = Nil): Fluent =
      new Fluent(graft.ts.Windows.maxDrawdown(df, partitionCols,
        valueCol, orderCol, tieCols))
    /** CUSUM drift flags per ordered series. */
    def cusumFlags(partitionCols: Seq[String], valueCol: String,
                   orderCol: String, tieCols: Seq[String] = Nil,
                   threshold: Double = 5.0): Fluent =
      new Fluent(graft.ts.Windows.cusumFlags(df, partitionCols, valueCol,
        orderCol, tieCols, threshold))
    /** Benford first-digit audit of a positive value column. */
    def benford(valueCol: String, decimals: Int = 2): Fluent =
      new Fluent(graft.stats.DataAudit.benford(df, valueCol, decimals))
    /** Join-key skew report for shuffle/broadcast/salting decisions. */
    def keySkew(keyCol: String, k: Int = 10): Fluent =
      new Fluent(graft.stats.DataAudit.keySkew(df, keyCol, k))
    /** Basket co-occurrence associations (support / lift). */
    def pairAssociations(basketCol: String, itemCol: String,
                         minPairs: Long = 1L): Fluent =
      new Fluent(graft.rel.Market.pairAssociations(df, basketCol,
        itemCol, minPairs))
    /** RFM quintile segmentation of customers. */
    def rfm(custCol: String, dateCol: String, amountCol: String): Fluent =
      new Fluent(graft.rel.Market.rfm(df, custCol, dateCol, amountCol))
    /** PageRank over this frame as (src, dst) edges. */
    def pageRank(srcCol: String, dstCol: String, iterations: Int = 3,
                 damping: Double = 0.85): Fluent =
      new Fluent(graft.rel.Graph.pageRank(df, srcCol, dstCol, iterations,
        damping))
    /** A/B two-proportion z-test of a boolean group vs outcome. */
    def abTest(groupCol: String, successCol: String): Fluent =
      new Fluent(graft.stats.Inferential.twoProportionZ(df, groupCol,
        successCol))
    /** Per-query ranking metrics of this frame (query/doc/rank) vs qrels. */
    def rankingMetrics(qrels: DataFrame, queryCol: String = "query",
                       docCol: String = "doc", rankCol: String = "rank",
                       relCol: String = "rel", k: Int = 10): Fluent =
      new Fluent(graft.ml.RankEval.rankingMetrics(df, qrels, queryCol,
        docCol, rankCol, relCol, k))
  }
}

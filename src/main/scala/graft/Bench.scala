package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  *
  * Queries are materialized through the `noop` datasource writer —
  * unlike `count()`, which lets Catalyst prune expensive projections
  * and eliminate sorts that don't change the row count, the noop sink
  * evaluates every output column of every row (honest end-to-end cost,
  * no result-collection or disk cost).
  *
  * Output contract: the FINAL stdout line is a single JSON object
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  * The driver only retains the last ~2000 characters of output, so the
  * final line carries a headline subset of per-query times (3 dp) and
  * stays well under that limit; the full per-query map is printed on
  * the preceding `BENCHALL` diagnostic line.
  */
object Bench {
  /** Representative queries across the operator families for the
    * compact headline map (full map goes on the BENCHALL line).
    * The driver retains only the LAST ~2000 chars of output and the
    * headline JSON must survive intact — keep this list pruned of
    * near-twin entries (the r12 line hit 1757 chars; a truncated head
    * breaks the driver's json parse). */
  private val headline = Seq(
    "smart_group", "merge_datasets", "asof_join", "topk_per_group",
    "pivot_wide", "quantiles_exact", "describe", "corr_matrix",
    "rank_window", "moving_avg", "decompose_seasonal", "acf",
    "sessionize", "audit_composite", "dedup_exact", "minhash_pairs",
    "drop_near_dups", "cosine_topk", "ivf_topk",
    "lang_id", "text_quality", "rep_stats", "activations",
    "extractive_summary", "sql_window", "ols_residuals",
    "kruskal_wallis", "zscore", "stream_dedup",
    "image_features", "haversine_nn_full", "pii_redact", "decontam",
    "token_budget_temp", "heavy_hitters_exact",
    "salted_sum", "chunk_tokens", "line_dedup", "url_dedup", "span_dedup",
    "unigram_ppl", "snapshot_dedup", "kn_ppl", "sb_ppl", "bm25_topk", "rrf_fuse", "cosine_i8_topk",
    "quality_clf", "semantic_dedup", "bm25_stream",
    "make_text", "cc_star", "llm_pipeline",
    "cluster_assign", "cluster_balance", "pq_topk", "stratified_hash",
    "weighted_sample", "dsir_select",
    "gopher_rules", "ngram_rep", "semantic_decontam", "bpe_encode",
    "pack_shards", "interval_join", "top_ngram",
    "rouge_doc", "bleu_corpus", "chrf_doc", "qa_eval",
    "winnow_pairs_xx", "blocklist_hits", "phrase_search", "corpus_js",
    "roc_auc", "rank_eval", "page_rank",
    "funnel", "basket_lift", "funnel_stream", "transitions_stream",
    "heavy_hitters_approx", "make_demo")

  def main(args: Array[String]): Unit = {
    // 1-min loadavg BEFORE this JVM does any work — the only sample
    // that cleanly gauges EXTERNAL load: once warmups/passes run,
    // local[N] self-load dominates /proc/loadavg (observed ~9 on 32
    // CPUs mid-suite) and a pass-start check false-trips on the
    // bench's own previous pass.
    val startLoad1m =
      (try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").headOption.flatMap(_.toDoubleOption)
      catch { case _: Throwable => None }).getOrElse(0.0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to the host's real core count, not a fixed "4": off-driver
    // isolated re-times (run without env vars) used to silently bench
    // local[4] AND stamp contended:true on a quiet box because the
    // contention threshold (cpus/4) was computed from the fake 4.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    // dev-only subset filter (comma-separated names); driver leaves unset
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()

    // Stabilization (r8 verdict: cross-round deltas were dominated by
    // JIT/ordering noise): (1) queries run in PINNED alphabetical
    // order, never hash-map order; (2) every query gets one untimed
    // warm-up at the smallest sf dir first — same plans, same
    // generated code, tiny data — so codegen/JIT cost lands in the
    // warm-up, not in whichever query happened to run first.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    val warmExists = new java.io.File(warmDir).isDirectory
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val warmups = if (warmExists) {
      names.foreach(n => try exec(n, warmDir) catch { case _: Throwable => })
      1
    } else 0
    // ivf entries cache their index PER SF DIR: warm them at the real
    // dir too so the timed run measures search, not the KMeans fit
    for (w <- Seq("ivf_topk", "ivf_topk_approx"))
      try exec(w, sfDir) catch { case _: Throwable => }
    spark.catalog.clearCache()

    // SPARK_GRAFT_ITERS controls per-query MEDIAN-of-N timing — the
    // defense against transient host contention polluting timings.
    // The N iterations are INTERLEAVED (r11 verdict): pass 1 runs the
    // whole sorted query list, then pass 2, then pass 3, and each
    // query's reported time is the median ACROSS passes. Consecutive
    // per-query iterations don't defend against a sustained
    // co-scheduled job, because all three iterations sit inside the
    // contention window (r11's artifact had 15 phantom regressions —
    // one 32x — concentrated in one alphabetical band). With
    // interleaving a contention window inflates ONE pass of many
    // queries, and the cross-pass median discards it.
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt.max(1)
    // A failed query must NEVER get a timing row — r10's artifact recorded
    // 35 queries' time-to-THROW as if it were a run time. Failures go to
    // the `errors` map and into the final JSON instead.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString(" ")
      catch { case _: Throwable => "" }
    val timesByName =
      scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    // 1-min loadavg snapshot at the start of each pass: evidence in the
    // artifact of WHEN host contention overlapped the run, so a future
    // adjudicator can see it without re-timing.
    val passLoads = scala.collection.mutable.ArrayBuffer[String]()
    for (pass <- 0 until iters) {
      passLoads += loadavg()
      for (name <- names if !errors.contains(name)) {
        try {
          val t0 = System.nanoTime()
          exec(name, sfDir)
          val dt = (System.nanoTime() - t0) / 1e9
          // entries persist() intermediates; drop them so storage doesn't
          // accumulate across 120+ queries and skew later timings via GC
          spark.catalog.clearCache()
          timesByName(name) = dt :: timesByName.getOrElse(name, Nil)
        } catch { case e: Throwable =>
          spark.catalog.clearCache()
          timesByName.remove(name)
          errors(name) =
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("\\s+", " ").take(200)
        }
      }
    }
    passLoads += loadavg()
    val results = timesByName.map { case (name, ts) =>
      val sorted = ts.sorted
      name -> sorted(sorted.size / 2)
    }.toMap
    // Per-query MIN across the interleaved passes: the contention-free
    // estimator for CPU-bound queries (r15 verdict — every flagged
    // "regression" of r14/r15 was interleaving noise that collapsed on
    // an isolated re-time; min self-adjudicates those without re-runs).
    val mins = timesByName.map { case (name, ts) => name -> ts.min }.toMap
    // Locale.ROOT: the driver parses this JSON; a comma decimal
    // separator under e.g. de_DE would break it.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val allQs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    println(s"BENCHALL cpus=$cpus $allQs")
    // full per-query minimums on their own diagnostic line —
    // bench_compare flags regressions on MIN ratios when both sides
    // carry them, so interleaving flaps self-adjudicate
    val allMins = mins.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    println(s"BENCHMIN cpus=$cpus $allMins")
    // Full error detail on its own diagnostic line; the final JSON line
    // carries every failed name (short messages) within the driver's
    // ~2000-char tail window — truncated messages beat a truncated line.
    if (errors.nonEmpty)
      println("BENCHERR " + errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
        .mkString("{", ",", "}"))
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v.take(40))}" }
      .mkString("{", ",", "}")
    // Headline selection (r12 verdict: the static list under-sampled
    // the heavy tail — basket_lift at 4.7 s was absent while
    // sub-second near-twins were in): every query with median >=
    // HEAVY_SEC is MANDATORY (costliest first), then the
    // family-representative list fills whatever remains of the
    // driver's ~2000-char tail window. The rule ships in the artifact
    // as "headline_rule" so future rounds compare like with like.
    val HEAVY_SEC = 1.5
    val heavy = results.filter(_._2 >= HEAVY_SEC).toSeq
      .sortBy { case (n, t) => (-t, n) }.map(_._1)
    val reps = headline.filter(n =>
      results.contains(n) && !heavy.contains(n))
    val loadsJson = passLoads.map(jstr).mkString("[", ",", "]")
    // Self-adjudicating contention guard (the r13 267.2s artifact was
    // taken under loadavg ~4 with concurrent builds and needed manual
    // re-timing to dismiss): stamp contended=true when the PRE-RUN
    // 1-min loadavg exceeds cpus/4 (external load at launch), or when
    // a pass STARTS above the full core count — beyond any plausible
    // self-load, so mid-run external interference still trips it.
    // (Pass-start checks at cpus/4 false-tripped on the bench's OWN
    // decaying load from the previous pass — r15's first quiet-box
    // closing run stamped contended at pass-2 loadavg 9.24/32 with
    // the box at 0.07 before launch.)
    val cpuCount = cpus.toDoubleOption.getOrElse(4.0)
    val contended = startLoad1m > cpuCount / 4.0 ||
      passLoads.dropRight(1).exists { l =>
        l.split("\\s+").headOption.flatMap(_.toDoubleOption)
          .exists(_ > cpuCount)
      }
    val headlineRule = s"all>=${HEAVY_SEC}s then representatives, pruned to fit"
    // the artifact carries BOTH estimators for the same picked keys:
    // "queries" stays the median (the driver's documented contract),
    // "queries_min" the cross-pass minimum (r15 verdict ask — a flap
    // like r15's bootstrap_ci self-adjudicates with zero re-runs)
    def mapOf(keys: Seq[String], vals: Map[String, Double]): String =
      keys.map(k => s"\"" + k + "\":" + fmt(vals(k)))
        .mkString("{", ",", "}")
    def line(keys: Seq[String]): String =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${mapOf(keys, results)},"queries_min":${mapOf(keys, mins)},"headline_rule":"$headlineRule","sf":"$sfDir","cpus":$cpus,"timed_iters":$iters,"interleaved":true,"contended":$contended,"loadavg_at_start":$startLoad1m,"loadavg_per_pass":$loadsJson,"warmup_iters":$warmups,"warmup_sf":"${if (warmExists) warmDir else ""}","error_count":${errors.size},"errors":$errJson}"""
    // grow the headline map until the WHOLE line would cross the
    // driver's retention window. The budget is a HARD cap: heavy
    // entries get priority by iterating first, but force-including
    // them past the window (the pre-r16 behavior) now OVERFLOWS it —
    // with queries_min doubling per-key cost, a contended run's long
    // heavy list pushed the line to 2.5k chars and the driver's tail
    // capture would truncate the line's head, breaking its json parse.
    // The window holds MORE than this line: sbt prints a trailing
    // "[success] Total time: ..." line (~80 chars) AFTER it, which at
    // the former 1950 budget pushed the JSON's head out of the 2000-
    // char tail and broke the driver's parse in r17 AND r18
    // (BENCH_r18.json: parsed=null, tail starts mid-line). Budget =
    // 2000 − 120 headroom for the sbt epilogue + newlines.
    val budget = 1880
    val picked = scala.collection.mutable.ArrayBuffer[String]()
    for (n <- heavy ++ reps) {
      if (line((picked :+ n).toSeq).length <= budget)
        picked += n
    }
    println(line(picked.toSeq))
    spark.stop()
  }
}

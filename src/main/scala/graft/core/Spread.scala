package graft.core

import org.apache.spark.sql.DataFrame

/** Idle-capacity guard for CPU-heavy row-expansion kernels (guide
  * §2.6 stragglers / idle capacity): a small corpus read from one
  * parquet/feather file arrives in 1–2 scan partitions, so a
  * tokenize/explode/hash kernel whose work is orders of magnitude
  * larger than its input bytes serializes onto 1–2 tasks while every
  * other core idles — Profile showed quality_clf spending 2.4 of
  * 3.0 s in ONE task, and the whole LM ladder's count tables building
  * through single-task stages, because documents.parquet is one scan
  * split. The sibling of [[graft.ml.Similarity.spreadForPairScan]]
  * (which covers the n² pair screens) for linear-but-heavy kernels.
  *
  * Round-robin repartition to defaultParallelism; inputs that already
  * carry at least that many partitions (any real at-scale scan) keep
  * them, so this is a no-op exactly where the cluster is already
  * busy. Row placement never affects declared results: every
  * downstream aggregate is either exact-integer or rounds at the
  * library's documented 6-dp sum-order contract.
  */
object Spread {
  def scan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}

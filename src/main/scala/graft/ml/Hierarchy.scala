package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Agglomerative hierarchical clustering (SciPy-style linkage matrix).
  *
  * Reference: `linkage_matrix` (gofast/utils/mathext.py:5222), a wrapper
  * over scipy.cluster.hierarchy.linkage.
  *
  * Scale design: linkage is inherently O(n²) state driving a sequential
  * merge loop — scipy itself tops out around 10⁴ observations. The
  * 100 TB path is upstream REDUCTION, not a distributed dendrogram:
  * sample (`rel.Sampling`) or coarse-cluster (`pipeline.Stages` KMeans)
  * down to ≤ `maxRows` representatives — both distributed — then
  * linkage the representatives here. [[pairwiseDistances]] is the
  * distributed distance kernel, usable on its own (and oracle-checked).
  */
object Hierarchy {

  /** Pairwise Euclidean distances (id_a < id_b) over an array column,
    * computed distributed; shuffle ∝ n² — bound the input. The sum is
    * a sequential left fold from 0.0, matching the DuckDB oracle's
    * list_reduce bit-for-bit. */
  def pairwiseDistances(df: DataFrame, idCol: String, vecCol: String)
      : DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("_va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("_vb"))
    def d2(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        sqrt(aggregate(zip_with(col("_va"), col("_vb"), d2),
          lit(0.0), (acc, v) => acc + v)).as("dist"))
  }

  /** SciPy-convention linkage matrix: one row per merge
    * (id_a, id_b, dist, size) where observations are labeled 0..n−1 in
    * ascending `idCol` order, merge k creates cluster n+k, id_a < id_b,
    * and rows appear in merge order (nondecreasing distance — global
    * closest-pair agglomeration with nearest-neighbor caches, ~O(n²)).
    * `method` ∈ single | complete | average (Lance–Williams updates).
    * Requires n ≤ `maxRows`: the observation set is collected — see the
    * object scaladoc for why that is the honest design. */
  def linkageMatrix(df: DataFrame, idCol: String, featureCols: Seq[String],
                    method: String = "complete", maxRows: Int = 2000)
      : DataFrame = {
    require(Set("single", "complete", "average")(method),
      s"unsupported method '$method'")
    val spark = df.sparkSession
    import spark.implicits._
    val vec = array(featureCols.map(c => col(c).cast("double")): _*)
    val rows = df.select(col(idCol).cast("long"), vec)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val n = rows.length
    require(n <= maxRows, s"linkageMatrix: n=$n exceeds maxRows=$maxRows — " +
      "reduce to representatives first (Sampling / KMeans), then linkage")
    require(rows.iterator.map(_._1).distinct.length == n, "ids must be distinct")
    require(n >= 2, "need at least two observations")
    val feats = rows.map(_._2.toArray)
    val d = Array.tabulate(n, n) { (i, j) =>
      if (i == j) 0.0
      else {
        val (a, b) = (feats(i), feats(j))
        var s = 0.0
        var k = 0
        while (k < a.length) { val t = a(k) - b(k); s += t * t; k += 1 }
        math.sqrt(s)
      }
    }
    val active = Array.fill(n)(true)
    val size = Array.fill(n)(1L)
    val label = Array.tabulate(n)(_.toLong)
    val nnIdx = new Array[Int](n)
    val nnDist = new Array[Double](n)
    def rescan(i: Int): Unit = {
      var best = -1
      var bd = Double.MaxValue
      var j = 0
      while (j < n) {
        if (j != i && active(j) && d(i)(j) < bd) { bd = d(i)(j); best = j }
        j += 1
      }
      nnIdx(i) = best; nnDist(i) = bd
    }
    (0 until n).foreach(rescan)
    val merges = Seq.newBuilder[(Long, Long, Double, Long)]
    var step = 0
    while (step < n - 1) {
      var a = -1
      var bd = Double.MaxValue
      var i = 0
      while (i < n) { // global closest pair; ties resolve to smaller slot
        if (active(i) && nnIdx(i) >= 0 && nnDist(i) < bd) { bd = nnDist(i); a = i }
        i += 1
      }
      val b = nnIdx(a)
      val (sa, sb) = (size(a), size(b))
      merges += ((math.min(label(a), label(b)), math.max(label(a), label(b)),
        d(a)(b), sa + sb))
      var w = 0
      while (w < n) { // Lance-Williams fold of b into slot a
        if (w != a && w != b && active(w)) {
          val dw = method match {
            case "single"   => math.min(d(a)(w), d(b)(w))
            case "complete" => math.max(d(a)(w), d(b)(w))
            case "average"  => (sa * d(a)(w) + sb * d(b)(w)) / (sa + sb)
          }
          d(a)(w) = dw
          d(w)(a) = dw
        }
        w += 1
      }
      active(b) = false
      size(a) = sa + sb
      label(a) = n + step
      step += 1
      if (step < n - 1) {
        rescan(a)
        var k = 0
        while (k < n) {
          if (active(k) && k != a) {
            if (nnIdx(k) == a || nnIdx(k) == b) rescan(k)
            else if (d(k)(a) < nnDist(k)) { nnIdx(k) = a; nnDist(k) = d(k)(a) }
          }
          k += 1
        }
      }
    }
    merges.result().toDF("id_a", "id_b", "dist", "size")
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ts.{PerGroup, Windows}
import graft.ml.Similarity

class Batch14Spec extends SparkSpec {
  import spark.implicits._

  test("rank2Rows equals the single-window average rank, ties and nulls included") {
    val df = Seq(
      (1L, 5.0), (1L, 5.0), (1L, 1.0), (1L, 9.0), (1L, 9.0), (1L, 9.0),
      (2L, 3.0), (2L, 3.0), (2L, 3.0), (1L, Double.NaN), (2L, 7.0))
      .toDF("g", "v")
      .withColumn("v", when(isnan(col("v")), lit(null)).otherwise(col("v")))
    val got = Windows.rank2Rows(df, Seq("g"), "v", "_r2", buckets = 4)
    // reference: 2*avg-rank from the classic rank + tie-count windows
    val w = Window.partitionBy("g").orderBy("v")
    val ref = df.filter(col("v").isNotNull)
      .withColumn("_r2ref",
        lit(2L) * rank().over(w) + count(lit(1)).over(Window.partitionBy("g", "v")) - 1L)
    val joined = got.filter(col("v").isNotNull)
      .join(ref, Seq("g", "v")).filter(col("_r2") =!= col("_r2ref"))
    assert(joined.count() === 0)
    // null value -> null rank, row retained
    val nulls = got.filter(col("v").isNull).select("_r2").collect()
    assert(nulls.length === 1 && nulls.head.isNullAt(0))
  }

  test("rank2Rows agrees with distributedAvgRank across bucket counts") {
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(500)((rnd.nextInt(3).toLong, rnd.nextInt(40).toDouble))
      .toDF("g", "v")
    val a = Windows.rank2Rows(df, Seq("g"), "v", "_r2", buckets = 8)
      .groupBy("g", "v").agg(first("_r2").as("r8"))
    val b = Windows.rank2Rows(df, Seq("g"), "v", "_r2", buckets = 256)
      .groupBy("g", "v").agg(first("_r2").as("r256"))
    assert(a.join(b, Seq("g", "v")).filter(col("r8") =!= col("r256")).count() === 0)
  }

  test("ccf of a series with itself at lag 0 is 1") {
    val df = (1 to 50).map(i => (1L, i.toLong, i * 1.5)).toDF("k", "t", "v")
    val w = Window.partitionBy("k").orderBy("t")
    val x = col("v").cast("decimal(12,3)")
    val n = sum(lit(1L)).cast("double")
    val sx = sum(x).cast("double")
    val sxx = sum((x * x).cast("decimal(28,6)")).cast("double")
    val r = df.groupBy("k")
      .agg(((n * sxx - sx * sx) / (sqrt(n * sxx - sx * sx) * sqrt(n * sxx - sx * sx))).as("c"))
      .select("c").as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("histogram bins partition the data and count all rows") {
    val df = (1 to 1000).map(i => i.toDouble).toDF("x")
    val b = df.agg(min("x").as("_lo"), max("x").as("_hi"))
    val w = (col("_hi") - col("_lo")) / lit(20.0)
    val binned = df.crossJoin(broadcast(b))
      .withColumn("bin", least(floor((col("x") - col("_lo")) / w), lit(19L)))
    val counts = binned.groupBy("bin").count().orderBy("bin").collect()
    assert(counts.map(_.getLong(1)).sum === 1000L)
    assert(counts.length === 20)
    assert(counts.map(_.getLong(0)).toSeq === (0L to 19L))
  }

  test("laplace smoothing: probabilities sum to (N+K') / (N+K) and order preserved") {
    val df = Seq("a", "a", "a", "b", "c").toDF("cat")
    val counts = df.groupBy("cat").agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum("cnt").as("n"), count(lit(1)).as("k"))
    val p = counts.crossJoin(broadcast(tot))
      .select(((col("cnt") + 1L).cast("double") /
        (col("n") + col("k")).cast("double")).as("p"))
      .as[Double].collect()
    assert(math.abs(p.sum - 1.0) < 1e-12) // all categories present: sums to 1
    assert(p.max === 4.0 / 8.0)
  }

  test("ivf full probe reproduces brute-force top-k exactly") {
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 200L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val q = vecs(5)._2.map(_.toDouble).toSeq
    val brute = Similarity.cosineTopK(df, "embedding", "vec_id", q, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    val idx = Similarity.ivfIndex(df, "vec_id", "embedding", nlist = 8)
    val ivf = idx.search(q, k = 10, nprobe = 8)
      .select("vec_id").as[Long].collect().toSeq
    idx.unpersist()
    assert(ivf === brute)
  }

  test("ivfIndex falls back to the full set when the fit sample is smaller than nlist") {
    val rnd = new scala.util.Random(9)
    val vecs = (0L until 200L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    // 0.001 of 200 rows samples ~0 vectors — far fewer than nlist=8;
    // without the fallback KMeans.fit dies with an obscure MLlib error
    val idx = Similarity.ivfIndex(df, "vec_id", "embedding", nlist = 8,
      fitFraction = 0.001)
    val q = vecs(3)._2.map(_.toDouble).toSeq
    val full = idx.search(q, k = 5, nprobe = 8)
      .select("vec_id").as[Long].collect().toSeq
    idx.unpersist()
    val brute = Similarity.cosineTopK(df, "embedding", "vec_id", q, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(full === brute)
  }

  test("ivf partial probe (nprobe=4 of 16) keeps recall@15 >= 0.9") {
    // 8 well-separated clusters in 32-dim: each point = one-hot-ish
    // center + small deterministic jitter. The query's true top-15 all
    // live in its own cluster, so probing the 4 nearest centroids must
    // recover (nearly) all of them — the recall dial actually dialed,
    // unlike the exhaustive nprobe = nlist completeness check above.
    val rnd = new scala.util.Random(21)
    val vecs = for (c <- 0 until 8; i <- 0 until 100) yield {
      val v = Array.fill(32)(rnd.nextGaussian().toFloat * 0.05f)
      v(c * 4) += 1.0f
      ((c * 100 + i).toLong, v)
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(8)
    val q = vecs(7)._2.map(_.toDouble).toSeq // a cluster-0 member
    val idx = Similarity.ivfIndex(df, "vec_id", "embedding", nlist = 16)
    val exact = idx.search(q, k = 15, nprobe = 16)
      .select("vec_id").as[Long].collect().toSet
    val probed = idx.search(q, k = 15, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    idx.unpersist()
    val recall = exact.intersect(probed).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@15 = $recall")
    assert(exact.forall(_ < 100L)) // sanity: true neighbors are cluster 0
  }

  test("searchMany batch equals per-query search at the same nprobe") {
    val rnd = new scala.util.Random(17)
    val vecs = (0L until 300L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val qs = Seq(0L, 1L, 2L).map(qi =>
      qi -> vecs((qi * 37 + 5).toInt)._2.map(_.toDouble).toSeq)
    val idx = Similarity.ivfIndex(df, "vec_id", "embedding", nlist = 8)
    val batch = idx.searchMany(qs, k = 10, nprobe = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(-_.getDouble(2)).map(_.getLong(1)).toSeq }
    qs.foreach { case (qid, q) =>
      val single = idx.search(q, k = 10, nprobe = 4)
        .select("vec_id").as[Long].collect().toSeq
      assert(batch(qid) === single, s"query $qid diverged")
    }
    idx.unpersist()
  }

  test("planted embedding near-dups pass the 0.9 cosine gate; originals don't") {
    val rnd = new scala.util.Random(9)
    val vecs = (0L until 30L).map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val pert = df.select((col("vec_id") + 100L).as("vec_id"),
      concat(slice(col("embedding"), 1, 56),
        transform(slice(col("embedding"), 57, 8), v => v * lit(1.5f))).as("embedding"))
    val all = df.unionByName(pert)
    val a = all.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = all.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val sims = pairs.select(col("ia"), col("ib"),
      Similarity.cosineNative(pairs, col("ea"), col("eb")).as("cos"))
    val hits = sims.filter(col("cos") >= 0.9)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(hits === (0L until 30L).map(i => (i, i + 100L)).toSet)
  }

  test("kpss statistic is larger for a trending series than for noise") {
    val rnd = new scala.util.Random(13)
    val trend = (0 until 200).map(i => (1L, i.toLong, 0.1 * i + rnd.nextGaussian()))
    val noise = (0 until 200).map(i => (2L, i.toLong, rnd.nextGaussian()))
    val df = (trend ++ noise).toDF("k", "t", "v")
    val out = PerGroup.kpss(df, "k", "t", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(2L))
    assert(out(2L) < 0.5) // stationary noise stays under the 5% critical value
  }
}

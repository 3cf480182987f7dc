package graft

import org.apache.spark.sql.functions._
import graft.ml.Hierarchy

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  // observations 0..4 at 1-D positions 0, 1, 5, 6, 20 — small enough
  // that every scipy.cluster.hierarchy.linkage row is hand-checkable
  private lazy val pts = Seq(
    (0L, 0.0), (1L, 1.0), (2L, 5.0), (3L, 6.0), (4L, 20.0)).toDF("id", "x")

  private def rows(method: String) =
    Hierarchy.linkageMatrix(pts, "id", Seq("x"), method)
      .as[(Long, Long, Double, Long)].collect().toSeq

  test("complete linkage reproduces the scipy linkage matrix") {
    assert(rows("complete") === Seq(
      (0L, 1L, 1.0, 2L), (2L, 3L, 1.0, 2L),
      (5L, 6L, 6.0, 4L), (4L, 7L, 20.0, 5L)))
  }

  test("single linkage reproduces the scipy linkage matrix") {
    assert(rows("single") === Seq(
      (0L, 1L, 1.0, 2L), (2L, 3L, 1.0, 2L),
      (5L, 6L, 4.0, 4L), (4L, 7L, 14.0, 5L)))
  }

  test("average linkage (UPGMA) reproduces the true all-pairs means") {
    // d(c5,c6) = mean(5,6,4,5) = 5; d(c7,{20}) = mean(20,19,15,14) = 17
    assert(rows("average") === Seq(
      (0L, 1L, 1.0, 2L), (2L, 3L, 1.0, 2L),
      (5L, 6L, 5.0, 4L), (4L, 7L, 17.0, 5L)))
  }

  test("merge distances are nondecreasing on multivariate data") {
    val rnd = new scala.util.Random(5)
    val df = (0 until 60)
      .map(i => (i.toLong, rnd.nextGaussian(), rnd.nextGaussian(), rnd.nextGaussian()))
      .toDF("id", "a", "b", "c")
    val ds = Hierarchy.linkageMatrix(df, "id", Seq("a", "b", "c"), "average")
      .select("dist").as[Double].collect()
    assert(ds.length === 59)
    assert(ds.zip(ds.tail).forall { case (x, y) => x <= y })
  }

  test("guards: maxRows bound, duplicate ids, bad method") {
    intercept[IllegalArgumentException] {
      Hierarchy.linkageMatrix(pts, "id", Seq("x"), maxRows = 3)
    }
    intercept[IllegalArgumentException] {
      Hierarchy.linkageMatrix(pts.withColumn("id", lit(1L)), "id", Seq("x"))
    }
    intercept[IllegalArgumentException] {
      Hierarchy.linkageMatrix(pts, "id", Seq("x"), method = "ward")
    }
  }

  test("pairwiseDistances matches driver-side euclidean") {
    val df = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 12.0f))).toDF("id", "v")
    val got = Hierarchy.pairwiseDistances(df, "id", "v")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set((0L, 1L, 5.0), (0L, 2L, 12.0),
      (1L, 2L, math.sqrt(9.0 + 64.0))))
  }
}

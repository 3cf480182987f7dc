package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions
import graft.ml.Similarity

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  test("dot_f32/cosine_f32 match the interpreted HOF formulation bit-for-bit") {
    VectorExpressions.register(spark)
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.5f, -0.5f, 0.0f), Array(0.5f, 0.5f, 1.0f))).toDF("id", "a", "b")
    val out = df.select(
      call_function("dot_f32", col("a"), col("b")).as("dn"),
      Similarity.dot(col("a"), col("b")).as("dh"),
      call_function("cosine_f32", col("a"), col("b")).as("cn"),
      Similarity.cosine(col("a"), col("b")).as("ch")).collect()
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // identical double sums
      assert(r.getDouble(2) == r.getDouble(3))
    }
    assert(out(0).getDouble(0) == 32.0)
  }

  test("null input yields null, not a crash") {
    VectorExpressions.register(spark)
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]])).toDF("a", "b")
    val r = df.select(call_function("dot_f32", col("a"), col("b"))).head
    assert(r.isNullAt(0))
  }

  test("expressions survive whole-stage codegen on real embeddings") {
    VectorExpressions.register(spark)
    val emb = graft.core.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0).head.getSeq[Float](1).toArray
    val out = emb.select(col("vec_id"),
      call_function("cosine_f32", col("embedding"),
        array(q.map(lit(_)): _*)).as("cos"))
    // vec 0 against itself is exactly the max
    val top = out.orderBy(col("cos").desc).head
    assert(top.getLong(0) == 0L)
    assert(math.abs(top.getDouble(1) - 1.0) < 1e-6)
  }

  test("IVF index recall vs brute force on real embeddings") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 7).head.getSeq[Float](1)
      .map(_.toDouble).toSeq
    val exact = Similarity.cosineTopK(emb, "embedding", "vec_id", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 8)
    val approx = idx.search(q, 10, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    idx.unpersist()
    val recall = (exact intersect approx).size / 10.0
    assert(recall >= 0.5, s"recall $recall too low")
    assert(approx.contains(7L)) // the query vector's own bucket is probed
  }

  test("SQL surface works after registration") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      "SELECT dot_f32(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").head
    assert(r.getDouble(0) == 11.0)
  }
}

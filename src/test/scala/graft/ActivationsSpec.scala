package graft

import org.apache.spark.sql.functions._
import graft.encode.Activations
import graft.text.{Dedup, Quality}

class ActivationsSpec extends SparkSpec {
  import spark.implicits._

  private def evalAt(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                     xs: Double*): Seq[Double] =
    xs.toDF("x").select(f(col("x")).as("y")).as[Double].collect().toSeq

  test("relu / leaky / elu / selu at knowns") {
    assert(evalAt(Activations.relu, -2.0, 0.0, 3.0) == Seq(0.0, 0.0, 3.0))
    assert(evalAt(Activations.leakyRelu(_), -2.0, 3.0) == Seq(-0.02, 3.0))
    val elu = evalAt(Activations.elu(_), -1.0, 2.0)
    assert(math.abs(elu.head - (math.exp(-1.0) - 1)) < 1e-12 && elu(1) == 2.0)
    val selu = evalAt(Activations.selu, 1.0)
    assert(math.abs(selu.head - 1.0507009873554804) < 1e-12)
  }

  test("sigmoid family: sigmoid, hard, log at knowns") {
    val s = evalAt(Activations.sigmoid, 0.0, 2.0)
    assert(math.abs(s.head - 0.5) < 1e-12)
    assert(math.abs(s(1) - 1.0 / (1 + math.exp(-2.0))) < 1e-12)
    assert(evalAt(Activations.hardSigmoid, -3.0, 0.0, 3.0) == Seq(0.0, 0.5, 1.0))
    val ls = evalAt(Activations.logSigmoid, 0.0)
    assert(math.abs(ls.head - math.log(0.5)) < 1e-12)
  }

  test("gelu matches exact-erf GELU 0.5x(1+erf(x/sqrt2)) (activations.py:2980)") {
    // x·Φ(x) against scipy-exact Φ; the reference computes np/scipy erf
    // (compat/numpy.py:38) — its docstring example values are stale.
    val g = evalAt(Activations.gelu, 0.0, -1.0, 2.0, 3.0)
    val expect = Seq(0.0, -1.0 * 0.15865525393145707,
      2.0 * 0.9772498680518208, 3.0 * 0.9986501019683699)
    g.zip(expect).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6, s"$a vs $b") }
  }

  test("mish / swish / elish / softplus / tanhshrink at knowns") {
    def sig(x: Double) = 1.0 / (1 + math.exp(-x))
    val x = 1.3
    val out = Seq(x).toDF("x").select(
      Activations.mish(col("x")), Activations.swish(col("x")),
      Activations.elish(col("x")), Activations.softplus(col("x")),
      Activations.tanhshrink(col("x")))
      .as[(Double, Double, Double, Double, Double)].head
    assert(math.abs(out._1 - x * math.tanh(math.log1p(math.exp(x)))) < 1e-12)
    assert(math.abs(out._2 - x * sig(x)) < 1e-12)
    assert(math.abs(out._3 - x * sig(x)) < 1e-12) // x >= 0 branch
    assert(math.abs(out._4 - math.log1p(math.exp(x))) < 1e-12)
    assert(math.abs(out._5 - (x - math.tanh(x))) < 1e-12)
    val en = evalAt(Activations.elish(_: org.apache.spark.sql.Column), -1.5)
    assert(math.abs(en.head - (math.exp(-1.5) - 1) * sig(-1.5)) < 1e-12)
  }

  test("softplus is overflow-stable at |x| = 800") {
    val out = evalAt(Activations.softplus, 800.0, -800.0)
    assert(out.head == 800.0 && out(1) == 0.0) // naive ln(1+e^x) would be Inf / e^-800 underflow
  }

  test("registry covers the reference set and rejects unknowns") {
    val expected = Set("relu", "leaky_relu", "elu", "selu", "sigmoid",
      "hard_sigmoid", "log_sigmoid", "tanh", "tanhshrink", "softplus",
      "swish", "swish1", "hard_swish", "gelu", "mish", "elish")
    assert(Activations.byName.keySet == expected)
    val df = Seq(1.0).toDF("v")
    assertThrows[IllegalArgumentException] {
      Activations.transformColumns(df, Seq("v"), "gaussian")
    }
    val out = Activations.transformColumns(df, Seq("v"), "relu", preScale = -2.0)
    assert(out.columns.contains("v_relu") &&
      out.select("v_relu").as[Double].head == 0.0)
  }

  test("register exposes activations to SQL without clobbering built-ins") {
    Activations.register(spark)
    val g = spark.sql("SELECT gelu(2.0) AS g, mish(1.3) AS m, relu(-4.0) AS r")
      .as[(Double, Double, Double)].head
    assert(math.abs(g._1 - 2.0 * 0.9772498680518208) < 1e-6)
    assert(math.abs(g._2 - 1.3 * math.tanh(math.log1p(math.exp(1.3)))) < 1e-9)
    assert(g._3 == 0.0)
    // tanh stays the Spark built-in (registration must skip it)
    val t = spark.sql("SELECT tanh(0.5) AS t").as[Double].head
    assert(t == math.tanh(0.5))
  }

  test("softmaxRows sums to 1 and is stable under large magnitudes") {
    val df = Seq((1000.0, 1001.0, 999.0)).toDF("a", "b", "c")
    val out = Activations.softmaxRows(df, Seq("a", "b", "c"))
      .select("a_softmax", "b_softmax", "c_softmax")
      .as[(Double, Double, Double)].head
    assert(math.abs(out._1 + out._2 + out._3 - 1.0) < 1e-12)
    assert(out._2 > out._1 && out._1 > out._3) // ordering preserved
    val z = math.exp(-1.0) + 1.0 + math.exp(-2.0)
    assert(math.abs(out._2 - 1.0 / z) < 1e-12)
  }

  test("connectedComponents resolves chains, cycles, and separate clusters") {
    // chain 1-2-3, triangle 10-11-12 plus cross edge 12-10, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges on a long path (diameter > 1 round)") {
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(comp.size == 10 && comp.values.forall(_ == 0L))
  }

  test("dropNearDuplicates keeps one canonical doc per near-dup cluster") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val df = Seq(
      (1L, base),
      (2L, base.replace("alpha ", "")),          // near-dup of 1
      (3L, base.replace("beta ", "")),           // near-dup of 1 (and 2)
      (9L, "one two three four five six seven eight nine ten eleven " +
           "twelve thirteen fourteen fifteen sixteen")).toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(df, "doc_id", "text", threshold = 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 9L)) // cluster {1,2,3} -> min id 1; 9 untouched
  }

  test("dropNearDuplicates clone collapse: exact-dup texts drop to the " +
      "min id and the survivor set equals the uncollapsed path") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val other = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen"
    val df = (Seq(
      (1L, base),
      (2L, base.replace("alpha ", "")), // near-dup bridging into 1
      (9L, other),
      (20L, "tiny")) ++                 // shingle-less: passes through
      // exact clone sets: base re-appears at 5,6,7; other at 30,31
      Seq(5L, 6L, 7L).map((_, base)) ++ Seq(30L, 31L).map((_, other)))
      .toDF("doc_id", "text")
    Seq(0.4, 1.0).foreach { t =>
      val collapsed = Dedup.dropNearDuplicates(df, "doc_id", "text",
          threshold = t)
        .select("doc_id").as[Long].collect().toSet
      val plain = Dedup.dropNearDuplicates(df, "doc_id", "text",
          threshold = t, collapseClones = false)
        .select("doc_id").as[Long].collect().toSet
      assert(collapsed == plain, s"threshold $t survivor sets diverge")
      assert(Set(1L, 9L, 20L).subsetOf(collapsed), s"threshold $t")
      assert(collapsed.intersect(Set(5L, 6L, 7L, 30L, 31L)).isEmpty,
        s"threshold $t clones survived")
    }
  }

  test("repetitionStats flags duplicated token mass and the dominant bigram") {
    val df = Seq(
      (1L, "spam spam spam spam ham"),
      (2L, "all words here are unique tokens")).toDF("doc_id", "text")
    val out = Quality.repetitionStats(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Double, String, Long, Double)].collect()
    val r1 = out(0)
    assert(r1._2 == 0.8) // 4 of 5 occurrences are of a repeated token
    assert(r1._3 == "spam spam" && r1._4 == 3L)
    assert(math.abs(r1._5 - 3.0 * 9 / 23) < 1e-9)
    val r2 = out(1)
    assert(r2._2 == 0.0 && r2._4 == 1L) // every bigram occurs once; lexicographic min wins
    assert(r2._3 == "all words")
  }

  test("repetitionStats keeps empty and whitespace-only docs (ratio 0)") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "real content here"))
      .toDF("doc_id", "text")
    val out = Quality.repetitionStats(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Double, String, Long, Double)].collect()
    assert(out.length == 3) // no doc silently vanishes from the report
    assert(out(0)._2 == 0.0 && out(0)._3 == "" && out(0)._4 == 0L)
    assert(out(1)._2 == 0.0)
  }

  test("softmaxRows on a single column is 1.0, not an analysis error") {
    val df = Seq(3.5, -2.0).toDF("a")
    val out = Activations.softmaxRows(df, Seq("a"))
      .select("a_softmax").as[Double].collect()
    assert(out.forall(_ == 1.0))
  }

  test("connectedComponents raises on non-numeric ids instead of no-op dedup") {
    val pairs = Seq(("docA", "docB")).toDF("id_a", "id_b")
    // either our raise_error fires (non-ANSI: cast -> null) or the
    // ANSI cast itself throws — both are loud; silence was the bug
    intercept[Exception] { Dedup.connectedComponents(pairs).collect() }
  }
}

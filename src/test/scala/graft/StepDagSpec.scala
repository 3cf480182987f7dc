package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{Step, StepDag}

class StepDagSpec extends SparkSpec {
  import spark.implicits._

  private def base: DataFrame = Seq(1, 2, 3).toDF("v")
  private def total(df: DataFrame): Long =
    df.agg(sum("v")).head().getLong(0)

  test("steps run in dependency order and chain outputs") {
    val dag = new StepDag(Seq(
      Step("double", df => df.withColumn("v", col("v") * 2)),
      Step("add_ten", df => df.withColumn("v", col("v") + 10),
        dependsOn = Seq("double")),
      Step("audit", identity, dependsOn = Seq("add_ten"))))
    val r = dag.run(base)
    assert(r.states.map(_._1) === Seq("double", "add_ten", "audit"))
    assert(r.states.forall(_._2.status == "success"))
    assert(total(r.output.get) === (2 + 4 + 6) + 30)
  }

  test("false condition skips the step and blocks its dependents") {
    val dag = new StepDag(Seq(
      Step("load", identity),
      Step("expensive", df => df.withColumn("v", col("v") * 100),
        dependsOn = Seq("load"),
        condition = Some(df => df.count() > 1000)), // not met
      Step("downstream", identity, dependsOn = Seq("expensive"))))
    val r = dag.run(base)
    assert(r("expensive").status === "skipped")
    assert(r("downstream").status === "blocked")
    assert(total(r.output.get) === 6) // last produced output is load's
  }

  test("false condition diverts to the fallback step, which feeds dependents") {
    val dag = new StepDag(Seq(
      Step("load", identity),
      Step("cheap", df => df.withColumn("v", col("v") + 1)), // fallback-only
      Step("expensive", df => df.withColumn("v", col("v") * 100),
        dependsOn = Seq("load"),
        condition = Some(df => df.count() > 1000),
        fallback = Some("cheap")),
      Step("downstream", identity, dependsOn = Seq("expensive"))))
    val r = dag.run(base)
    assert(r("expensive").status === "diverted")
    assert(r("cheap").status === "success")
    assert(r("downstream").status === "success")
    assert(total(r.output.get) === 2 + 3 + 4)
  }

  test("failing step retries with exponential backoff then succeeds") {
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val dag = new StepDag(Seq(
      Step("flaky", df => {
        calls += 1
        if (calls < 3) sys.error("transient")
        df
      }, maxRetries = 3, initialDelayMs = 10L)),
      sleep = delays += _)
    val r = dag.run(base)
    assert(r("flaky").status === "success")
    assert(r("flaky").attempts === 3)
    assert(delays.toSeq === Seq(10L, 20L)) // 2^(k-1) * initial
  }

  test("retries exhausted aborts the run with the step name") {
    val dag = new StepDag(Seq(
      Step("doomed", _ => sys.error("nope"), maxRetries = 1)),
      sleep = _ => ())
    val e = intercept[RuntimeException](dag.run(base))
    assert(e.getMessage.contains("doomed") && e.getMessage.contains("2 attempt"))
  }

  test("cycles and unknown dependencies are rejected at construction") {
    intercept[IllegalArgumentException] {
      new StepDag(Seq(
        Step("a", identity, dependsOn = Seq("b")),
        Step("b", identity, dependsOn = Seq("a"))))
    }
    intercept[IllegalArgumentException] {
      new StepDag(Seq(Step("a", identity, dependsOn = Seq("ghost"))))
    }
    intercept[IllegalArgumentException] {
      new StepDag(Seq(Step("a", identity), Step("a", identity)))
    }
  }
}

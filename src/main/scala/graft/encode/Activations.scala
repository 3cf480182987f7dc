package graft.encode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Activation-function transformers
  * (gofast/transformers/activations.py:218-4692: ReLU :218, Sigmoid
  * :467, Tanh :699, ELU :986, LeakyReLU :1258, Softmax :1558, Swish
  * :1853, HardSigmoid :2120, HardSwish :2394, Softplus :2618, GELU
  * :2832, SELU :3057, Mish :3309, ELISH :3575, LogSigmoid :3857,
  * Tanhshrink :4111, Swish1 :4366, registry :4692).
  *
  * The reference wraps each as a sklearn transformer with batch loops
  * and backend switches; on Spark every one is a pure codegen'd column
  * expression — whole-stage-codegen'd, no UDF, no shuffle, so applying
  * them to 100 TB is a single streaming map over the scan. The sklearn
  * `scale`/`shift` knobs become the `preScale`/`preShift` arguments
  * (applied to the input, `f(scale·x + shift)`, matching the reference
  * Sigmoid/Tanh docs).
  *
  * exp/tanh/ln cross libm boundaries between engines; query entries
  * round at 9 dp for portability (same convention as
  * [[graft.stats.Distributions]]).
  */
object Activations {

  /** max(0, x) */
  def relu(x: Column): Column = greatest(x, lit(0.0))

  /** x if x > 0 else α·x */
  def leakyRelu(x: Column, alpha: Double = 0.01): Column =
    when(x > 0, x).otherwise(lit(alpha) * x)

  /** x if x > 0 else α·(eˣ − 1) */
  def elu(x: Column, alpha: Double = 1.0): Column =
    when(x > 0, x).otherwise(lit(alpha) * (exp(x) - 1))

  /** λ·(x if x > 0 else α·(eˣ − 1)) with the fixed SELU constants. */
  def selu(x: Column): Column = {
    val scale = 1.0507009873554804
    val alpha = 1.6732632423543772
    lit(scale) * when(x > 0, x).otherwise(lit(alpha) * (exp(x) - 1))
  }

  /** 1 / (1 + e⁻ˣ) */
  def sigmoid(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  /** max(0, min(1, 0.2·x + 0.5)) */
  def hardSigmoid(x: Column): Column =
    greatest(lit(0.0), least(lit(1.0), lit(0.2) * x + lit(0.5)))

  /** ln σ(x) = −softplus(−x) — computed in the stable softplus form. */
  def logSigmoid(x: Column): Column = -softplus(-x)

  /** tanh in the portable exp form sign(x)·(1 − 2/(e^{2|x|}+1)):
    * within ~2 ulp of libm tanh, overflow-stable (e^{2|x|}→∞ gives
    * ±1), and expressible identically on any SQL engine — DuckDB 1.0
    * ships no tanh built-in, so the oracle replays this exact tree. */
  def tanhA(x: Column): Column =
    signum(x) * (lit(1.0) - lit(2.0) / (exp(lit(2.0) * abs(x)) + lit(1.0)))

  /** x − tanh(x) */
  def tanhshrink(x: Column): Column = x - tanhA(x)

  /** ln(1 + eˣ), overflow-stable: max(x,0) + ln(1 + e^−|x|). */
  def softplus(x: Column): Column =
    greatest(x, lit(0.0)) + log(lit(1.0) + exp(-abs(x)))

  /** x·σ(x) (Swish / SiLU; Swish1 is the β=1 case — same function). */
  def swish(x: Column): Column = x * sigmoid(x)

  /** x·HardSigmoid(x) */
  def hardSwish(x: Column): Column = x * hardSigmoid(x)

  /** 0.5·x·(1 + erf(x/√2)) — exact-form GELU via the same
    * Abramowitz–Stegun 7.1.26 erf polynomial as
    * [[graft.stats.Distributions.normalCdf]] (|ε|<1.5e-7; Spark has no
    * built-in erf, and the identical polynomial runs on both engines).
    */
  def gelu(x: Column): Column = x * phi(x)

  /** x·tanh(softplus(x)) */
  def mish(x: Column): Column = x * tanhA(softplus(x))

  /** x·σ(x) if x ≥ 0 else (eˣ − 1)·σ(x) */
  def elish(x: Column): Column =
    when(x >= 0, x * sigmoid(x)).otherwise((exp(x) - 1) * sigmoid(x))

  /** Standard-normal CDF, unrounded (internal GELU carrier). */
  private def phi(x: Column): Column = {
    val z = x / math.sqrt(2.0)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * abs(z))
    val poly = t * (lit(0.254829592) + t * (lit(-0.284496736) +
      t * (lit(1.421413741) + t * (lit(-1.453152027) + t * lit(1.061405429)))))
    val erfAbs = lit(1.0) - poly * exp(-abs(z) * abs(z))
    val erf = when(z >= 0, erfAbs).otherwise(-erfAbs)
    lit(0.5) * (lit(1.0) + erf)
  }

  /** Name → expression registry (`get_activation_transformer`,
    * activations.py:4692). Unknown names raise with the valid set. */
  val byName: Map[String, Column => Column] = Map(
    "relu" -> relu _,
    "leaky_relu" -> (leakyRelu(_: Column)),
    "elu" -> (elu(_: Column)),
    "selu" -> selu _,
    "sigmoid" -> sigmoid _,
    "hard_sigmoid" -> hardSigmoid _,
    "log_sigmoid" -> logSigmoid _,
    "tanh" -> tanhA _,
    "tanhshrink" -> tanhshrink _,
    "softplus" -> softplus _,
    "swish" -> swish _,
    "swish1" -> swish _,
    "hard_swish" -> hardSwish _,
    "gelu" -> gelu _,
    "mish" -> mish _,
    "elish" -> elish _)

  /** Register every activation as a 1-arg SQL function on the session
    * (`SELECT gelu(x) FROM t`). The registered expression is the same
    * composed native tree the Column API builds — fully whole-stage
    * codegen'd, no UDF. Names already bound to Spark built-ins (e.g.
    * `tanh`) are left untouched so registration never changes the
    * semantics of standard SQL. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    val registry = spark.sessionState.functionRegistry
    byName.foreach { case (name, f) =>
      if (!FunctionRegistry.builtin.functionExists(FunctionIdentifier(name)))
        registry.registerFunction(
          FunctionIdentifier(name),
          new ExpressionInfo(Activations.getClass.getName, name),
          (children: Seq[Expression]) => {
            require(children.length == 1, s"$name expects one argument")
            GraftColumnBridge.toExpr(spark,
              f(GraftColumnBridge.toColumn(children.head)))
          })
    }
  }

  /** Apply a named activation to each of `cols`, appending
    * `<col>_<name>` output columns; `f(preScale·x + preShift)` mirrors
    * the reference transformers' scale/shift knobs. One streaming
    * projection — no shuffle regardless of column count. */
  def transformColumns(df: DataFrame, cols: Seq[String], name: String,
                       preScale: Double = 1.0, preShift: Double = 0.0): DataFrame = {
    val f = byName.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown activation '$name'; one of ${byName.keys.toSeq.sorted.mkString(", ")}"))
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(s"${c}_$name",
        f(lit(preScale) * col(c).cast("double") + lit(preShift)))
    }
  }

  /** Row-wise softmax across a set of columns (SoftmaxTransformer,
    * activations.py:1558): eˣⁱ/Σeˣʲ with the max-subtraction stability
    * shift. Appends `<col>_softmax` per input column; pure projection.
    */
  def softmaxRows(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "softmax needs at least one column")
    val xs = cols.map(c => col(c).cast("double"))
    // greatest() needs >= 2 args; a singleton softmax is exp(0)/1 = 1.0
    val m = if (xs.size == 1) xs.head else greatest(xs: _*)
    val es = xs.map(x => exp(x - m))
    val z = es.reduce(_ + _)
    cols.zip(es).foldLeft(df) { case (d, (c, e)) =>
      d.withColumn(s"${c}_softmax", e / z)
    }
  }
}

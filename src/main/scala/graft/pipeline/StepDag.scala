package graft.pipeline

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** One named unit of work in a [[StepDag]].
  *
  * @param name        unique step id
  * @param run         the step body — builds/executes distributed Spark
  *                    plans; receives the last dependency's output (the
  *                    DAG input for root steps)
  * @param dependsOn   names of steps that must succeed first
  * @param condition   evaluated on the step's input; `false` skips the
  *                    step (or diverts to `fallback`)
  * @param fallback    step executed with the same input when `condition`
  *                    is false; its output flows to this step's dependents
  * @param maxRetries  extra attempts after a failure
  * @param initialDelayMs backoff base: attempt k sleeps 2^(k−1)·this
  */
final case class Step(
    name: String,
    run: DataFrame => DataFrame,
    dependsOn: Seq[String] = Nil,
    condition: Option[DataFrame => Boolean] = None,
    fallback: Option[String] = None,
    maxRetries: Int = 0,
    initialDelayMs: Long = 0L)

/** Terminal state of one step after a [[StepDag.run]]. `status` is one
  * of success | skipped | diverted | failed | blocked. */
final case class StepState(status: String, output: Option[DataFrame],
                           attempts: Int)

/** Outcome of a DAG run: per-step states in execution order, plus the
  * output of the last step that produced one. */
final case class DagReport(states: Seq[(String, StepState)]) {
  def apply(name: String): StepState = states.find(_._1 == name).get._2
  def output: Option[DataFrame] = states.reverseIterator
    .flatMap(_._2.output).nextOption()
}

/** Thin driver-side step-DAG orchestrator over Spark actions/plans.
  *
  * Reference semantics: `PipelineStep`/`PipelineManager` topological
  * execution with per-step metadata (gofast/mlops/pipeline.py:58, :489,
  * :654), `execute_step_conditionally` with optional fallback
  * (pipeline.py:2520), and `smart_retry_with_backoff` exponential
  * retries (pipeline.py:2837).
  *
  * Deliberately DRIVER-side control flow: step bodies declare or execute
  * distributed Spark plans; the DAG layer itself never touches data, so
  * it adds nothing to the shuffle/scan profile at any scale.
  *
  * Rules:
  *  - steps run in dependency (Kahn) order; cycles and unknown names
  *    are rejected at construction;
  *  - a step's input is its LAST dependency's output, as in the
  *    reference manager; root steps receive the DAG input;
  *  - a step referenced as someone's `fallback` runs only when diverted
  *    to — never standalone;
  *  - a step whose condition is false is `skipped` (no fallback) or
  *    `diverted` (fallback output flows to its dependents);
  *  - a step whose dependency did not succeed is `blocked`;
  *  - a failing step retries `maxRetries` times with exponential
  *    backoff, then the run aborts (remaining steps `blocked`).
  *
  * @param sleep injectable so tests assert backoff without waiting
  */
final class StepDag(steps: Seq[Step], sleep: Long => Unit = Thread.sleep) {
  private val byName: Map[String, Step] = steps.map(s => s.name -> s).toMap
  require(byName.size == steps.size, "duplicate step names")
  steps.foreach { s =>
    (s.dependsOn ++ s.fallback).foreach(d => require(byName.contains(d),
      s"step '${s.name}' references unknown step '$d'"))
  }
  private val fallbackOnly: Set[String] = steps.flatMap(_.fallback).toSet

  /** Kahn topological order over the non-fallback steps. */
  private val order: Seq[String] = {
    val pending = mutable.Map.from(
      steps.filterNot(s => fallbackOnly(s.name))
        .map(s => s.name -> s.dependsOn.count(!fallbackOnly(_))))
    val queue = mutable.Queue.from(
      steps.map(_.name).filter(n => pending.get(n).contains(0)))
    val out = mutable.ArrayBuffer.empty[String]
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      out += n
      pending.remove(n)
      steps.filter(s => pending.contains(s.name) && s.dependsOn.contains(n))
        .foreach { s =>
          pending(s.name) -= 1
          if (pending(s.name) == 0) queue.enqueue(s.name)
        }
    }
    require(pending.isEmpty,
      s"dependency cycle among steps: ${pending.keys.mkString(", ")}")
    out.toSeq
  }

  private def attempt(s: Step, in: DataFrame): (DataFrame, Int) = {
    var tries = 0
    var delay = s.initialDelayMs
    while (true) {
      tries += 1
      try return (s.run(in), tries)
      catch {
        case e: Exception =>
          if (tries > s.maxRetries)
            throw new RuntimeException(
              s"step '${s.name}' failed after $tries attempt(s)", e)
          sleep(delay)
          delay *= 2
      }
    }
    sys.error("unreachable")
  }

  /** Execute the DAG on `input`. Throws after exhausted retries; the
    * report of a completed run carries every step's terminal state. */
  def run(input: DataFrame): DagReport = {
    val states = mutable.LinkedHashMap.empty[String, StepState]
    def inputFor(s: Step): Option[DataFrame] =
      s.dependsOn.filterNot(fallbackOnly) match {
        case Nil => Some(input)
        case deps =>
          if (deps.forall(d => states(d).status == "success" ||
              states(d).status == "diverted"))
            states(deps.last).output
          else None
      }
    for (name <- order) {
      val s = byName(name)
      inputFor(s) match {
        case None =>
          states(name) = StepState("blocked", None, 0)
        case Some(in) =>
          if (s.condition.forall(_(in))) {
            val (out, tries) = attempt(s, in)
            states(name) = StepState("success", Some(out), tries)
          } else s.fallback match {
            case Some(fb) =>
              val (out, tries) = attempt(byName(fb), in)
              states(fb) = StepState("success", Some(out), tries)
              states(name) = StepState("diverted", Some(out), 0)
            case None =>
              states(name) = StepState("skipped", None, 0)
          }
      }
    }
    DagReport(states.toSeq)
  }
}

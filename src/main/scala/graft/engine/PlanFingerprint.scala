package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan shape counters — the scale-safety regression net
  * (VERDICT r4 #3). The repo's 100 TB claims are structural: capped
  * bucket self-joins, one-exchange as-of, no cartesian stage anywhere on
  * the heavy chains. Those claims were previously enforced by review
  * only — an edit that un-pushed a cap filter or re-introduced an
  * uncapped self-join would stay green at sf0.1 and die at scale. Now
  * `graft.Bench` records one fingerprint per gate into
  * `BENCH/metrics.json` (`plan_fingerprints`) and PlanFingerprintSpec
  * asserts the expected bounds in CI.
  *
  * Counting happens on the STATIC plan (the AQE wrapper's `inputPlan`,
  * i.e. before any runtime re-plan): that is the deterministic shape a
  * test can pin, and the one that shows every `ShuffleExchangeExec` the
  * optimizer committed to. Subquery plans are not traversed (none of the
  * gate plans carry them).
  */
final case class PlanFingerprint(
    exchanges: Int,
    sorts: Int,
    broadcastHashJoins: Int,
    broadcastNLJoins: Int,
    sortMergeJoins: Int,
    cartesians: Int,
    asofNative: Int,
    wholeStageCodegen: Int) {
  def json: String =
    s"""{"exchanges":$exchanges,"sorts":$sorts,""" +
      s""""bhj":$broadcastHashJoins,"bnlj":$broadcastNLJoins,""" +
      s""""smj":$sortMergeJoins,"cartesian":$cartesians,""" +
      s""""asof":$asofNative,"wscg":$wholeStageCodegen}"""
}

object PlanFingerprint {

  def of(df: DataFrame): PlanFingerprint =
    ofPlan(df.queryExecution.executedPlan)

  def ofPlan(root: SparkPlan): PlanFingerprint = {
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: SparkPlan): Unit = {
      names += p.getClass.getSimpleName
      val kids = p match {
        // the INITIAL AQE plan: after EnsureRequirements (exchanges
        // visible) but before any runtime re-plan — deterministic, and
        // the shape the optimizer committed to. (inputPlan would show
        // ZERO exchanges: distribution requirements aren't inserted yet.)
        case a: AdaptiveSparkPlanExec => Seq(a.initialPlan)
        case _ => p.children
      }
      kids.foreach(walk)
    }
    walk(root)
    def c(n: String): Int = names.count(_ == n)
    PlanFingerprint(
      exchanges = c("ShuffleExchangeExec"),
      sorts = c("SortExec"),
      broadcastHashJoins = c("BroadcastHashJoinExec"),
      broadcastNLJoins = c("BroadcastNestedLoopJoinExec"),
      sortMergeJoins = c("SortMergeJoinExec"),
      cartesians = c("CartesianProductExec"),
      asofNative = c("AsOfJoinExec"),
      wholeStageCodegen = c("WholeStageCodegenExec"))
  }
}

/** Named component probes for [[graft.Bench]]'s fingerprint capture: the
  * heavy chains whose GATE DataFrames end in a lineage-truncating
  * checkpoint (connected components) would otherwise record only the
  * trivial post-materialization plan. Each probe is the static
  * pre-checkpoint pair/join plan that actually carries the scale risk.
  * Probes are PLANNED, never executed. */
object PlanProbes {
  def all(s: SparkSession, dir: String): Seq[(String, DataFrame)] = Seq(
    // the q39/q40 input: banded hyperplane-LSH pair generation (capped
    // bucket equi-join + exact cosine verify)
    "probe_lsh_pairs" -> Queries3.lshPairs(s, dir))
}

package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._

/** Static scale-smell linter over optimized logical plans — the
  * anti-pattern sweep that used to be a manual per-round grep, as a
  * machine-checked invariant. `GraftAppSpec` runs it over EVERY
  * registered `SparkEntry` query, so a new operator that sneaks in a
  * cartesian product, an unpartitioned full-corpus window, or an RDD
  * detour fails ONE named spec at build time instead of surfacing as a
  * 100 TB incident.
  *
  * Rules (each returns a human-readable finding):
  *  - `cartesian`: a Cross (or condition-less Inner) join where NEITHER
  *    side is provably tiny (`maxRows` unknown or > `smallRows`) and
  *    neither side carries an explicit broadcast hint.
  *    `crossJoin(broadcast(centroids))` passes — the hint is the
  *    author's standing assertion that the side is broadcast-sized
  *    (codebooks, grand totals), and the planner will refuse to build
  *    it any other way.
  *  - `global-window`: a Window with an empty partitionSpec whose input
  *    is not provably bounded (child `maxRows` unknown or >
  *    `smallRows`). A rank over a `limit(k)` result passes; a rank over
  *    the corpus does not.
  *  - `rdd-scan` (opt-in via `flagRddScan`): a LogicalRDD leaf. OFF in
  *    the registry-wide sweep because `localCheckpoint` plan truncation
  *    — which the iterative operators (connected components, PageRank,
  *    incremental stores) use deliberately to keep plans bounded —
  *    lands in the plan as the same node as a genuine
  *    `createDataFrame(rdd)` detour; use it on targeted plans that
  *    should stay fully in Tungsten (ScaleSpec does for Ids).
  *
  * Static bounds only: `maxRows` is Catalyst's own inference, so the
  * audit never executes the plan. */
object PlanAudit {

  final case class Finding(rule: String, node: String) {
    override def toString = s"[$rule] $node"
  }

  private def tiny(p: LogicalPlan, smallRows: Long): Boolean =
    p.maxRows.exists(_ <= smallRows)

  private def broadcastHinted(j: Join): Boolean =
    Seq(j.hint.leftHint, j.hint.rightHint).flatten
      .exists(_.strategy.contains(BROADCAST))

  def audit(df: DataFrame, smallRows: Long = 10000L,
            flagRddScan: Boolean = false): Seq[Finding] = {
    val plan = df.queryExecution.optimizedPlan
    plan.collect {
      case j: Join
        if (j.joinType == Cross ||
            (j.joinType == Inner && j.condition.isEmpty)) &&
          !tiny(j.left, smallRows) && !tiny(j.right, smallRows) &&
          !broadcastHinted(j) =>
        Finding("cartesian", j.simpleString(60))
      case w: Window if w.partitionSpec.isEmpty &&
          !tiny(w.child, smallRows) =>
        Finding("global-window", w.simpleString(60))
      case r: org.apache.spark.sql.execution.LogicalRDD if flagRddScan =>
        Finding("rdd-scan", r.simpleString(60))
    }
  }
}

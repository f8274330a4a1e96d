package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

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
  *  - `bnlj`: a BroadcastNestedLoopJoin in the PHYSICAL plan whose
  *    build side is not provably metadata-sized — i.e. does not descend
  *    (through non-row-expanding nodes) from an aggregate-to-one-row, a
  *    local relation, a bounded range, or a limit-k subtree. A
  *    nested-loop join streams every probe row past every build row, so
  *    its build side must be scalar-class (grand totals, vocab sizes,
  *    boundary samples) — a broadcast HINT is not enough here, because
  *    the hint only chooses the strategy, it does not bound the rows
  *    the nested loop multiplies by. Unlike the logical rules this one
  *    inspects `sparkPlan`: whether a non-equi join becomes a BNLJ is
  *    the planner's decision, so the gate audits what would execute.
  *    The deliberate exception is the exact brute-force kNN tier
  *    ([[graft.pipeline.Similarity.knnBruteForce]] — every query ×
  *    every vector BY CONSTRUCTION, the recall baseline the ANN tiers
  *    are measured against): callers audit those with
  *    `allowBnlj = true`, an explicit in-code whitelist rather than a
  *    human note in the plan ledger.
  *  - `rdd-scan` (opt-in via `flagRddScan`): a LogicalRDD leaf. OFF in
  *    the registry-wide sweep because `localCheckpoint` plan truncation
  *    — which the iterative operators (connected components, PageRank,
  *    incremental stores) use deliberately to keep plans bounded —
  *    lands in the plan as the same node as a genuine
  *    `createDataFrame(rdd)` detour; use it on targeted plans that
  *    should stay fully in Tungsten (ScaleSpec does for Ids).
  *
  * Static bounds only: `maxRows` is Catalyst's own inference and the
  * physical walk recurses over node types, so the audit never executes
  * the plan. */
object PlanAudit {

  final case class Finding(rule: String, node: String) {
    override def toString = s"[$rule] $node"
  }

  private def tiny(p: LogicalPlan, smallRows: Long): Boolean =
    p.maxRows.exists(_ <= smallRows)

  private def broadcastHinted(j: Join): Boolean =
    Seq(j.hint.leftHint, j.hint.rightHint).flatten
      .exists(_.strategy.contains(BROADCAST))

  /** Physical-plan row-bound proof for a BNLJ build side: true when the
    * subtree descends from a row-bounded leaf through nodes that never
    * ADD rows. An aggregate with no grouping keys is one row per
    * upstream partition (and exactly one at the final step); local
    * relations, bounded ranges, and limits carry their bound
    * explicitly. Anything unrecognized — in particular another join, a
    * generate/explode, or a plain table scan — fails the proof. */
  private def metadataSized(p: SparkPlan, smallRows: Long): Boolean = p match {
    // no grouping keys (or all-constant keys, e.g. groupBy(lit(0)) in
    // sketch merges) -> one row per upstream partition; otherwise an
    // aggregate still never EMITS more rows than it reads, so recurse
    case a: BaseAggregateExec =>
      a.groupingExpressions.isEmpty ||
        a.groupingExpressions.forall {
          case al: org.apache.spark.sql.catalyst.expressions.Alias =>
            al.child.foldable
          case g => g.foldable
        } ||
        metadataSized(a.child, smallRows)
    case l: LocalTableScanExec => l.rows.lengthCompare(smallRows.min(Int.MaxValue).toInt) <= 0
    case r: RangeExec => r.numElements <= BigInt(smallRows)
    case g: GlobalLimitExec => g.limit <= smallRows
    case g: LocalLimitExec => g.limit <= smallRows
    case t: TakeOrderedAndProjectExec => t.limit <= smallRows
    case r: ReusedExchangeExec => metadataSized(r.child, smallRows)
    case u @ (_: ProjectExec | _: FilterExec | _: SortExec |
              _: CoalesceExec | _: BroadcastExchangeExec |
              _: ShuffleExchangeExec | _: WholeStageCodegenExec |
              _: InputAdapter | _: AQEShuffleReadExec) =>
      metadataSized(u.children.head, smallRows)
    case _ => false
  }

  def audit(df: DataFrame, smallRows: Long = 10000L,
            flagRddScan: Boolean = false,
            allowBnlj: Boolean = false): Seq[Finding] = {
    val plan = df.queryExecution.optimizedPlan
    val logical = plan.collect {
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
    val physical =
      if (allowBnlj) Seq.empty
      else df.queryExecution.sparkPlan.collect {
        case b: BroadcastNestedLoopJoinExec
          if !metadataSized(b.buildSide match {
            case BuildLeft => b.left
            case BuildRight => b.right
          }, smallRows) =>
          Finding("bnlj", b.simpleString(60))
      }
    logical ++ physical
  }
}

package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite exact `count(DISTINCT x)` to the
  * HyperLogLog++ sketch when `spark.graft.approxDistinct=true`
  * (SURVEY.md §4: "rewrite count_distinct → HLL sketch at scale").
  *
  * Exact distinct counting expands into a two-phase aggregate whose first
  * phase shuffles every distinct value; the sketch keeps fixed-size state
  * per group. Flip the flag per session or per query block — analytics
  * code stays written as `count_distinct` (A3), deployments choose the
  * 100 TB behavior. Single-argument, unfiltered distincts only; result
  * type (long) is unchanged.
  *
  * Install via `GraftExtensions` (`spark.sql.extensions`) or on a live
  * session: `spark.experimental.extraOptimizations ++= Seq(ApproxDistinctRewrite)`.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  private val Flag = "spark.graft.approxDistinct"
  private val Rsd = "spark.graft.approxDistinct.rsd"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val session = SparkSession.getActiveSession
    val enabled = session.exists(_.conf.get(Flag, "false").toBoolean)
    if (!enabled) plan
    else {
      val rsd = session.map(_.conf.get(Rsd, "0.05").toDouble).getOrElse(0.05)
      plan.transform {
        case agg: Aggregate => agg.transformExpressions {
          case AggregateExpression(Count(Seq(child)), mode, true, None, id) =>
            AggregateExpression(
              HyperLogLogPlusPlus(child, rsd), mode, isDistinct = false,
              filter = None, resultId = id)
        }
      }
    }
  }
}

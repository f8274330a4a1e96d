package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-conversion funnel over an event stream: step k counts a user
  * only if an event of step k occurred STRICTLY AFTER that user's step
  * k-1 completion (the product-analytics "view → click → purchase"
  * question, with the ordering constraint that separates a funnel from
  * three independent counts).
  *
  * Shape at scale: ONE shuffle — the per-user aggregate collecting one
  * sorted timestamp list per step (each bounded by that user's own
  * event count, the same envelope any sessionization carries). Step
  * times then resolve per-row with array functions — `array_min` /
  * higher-order `filter` — so the sequential step dependency costs zero
  * extra passes, no UDF, no self-joins (the classic spelling is one
  * join per step). Null step times propagate: a user who never reached
  * step k-1 contributes nothing to step k, exactly the
  * `filter(l, x > null) = []` semantics on both Spark and the oracle's
  * DuckDB lambdas. */
object Funnel {

  /** Per-user step-completion times: `(user_id, t_<step1>, ...)` —
    * null from the first uncompleted step onward. */
  def stepTimes(events: DataFrame, steps: Seq[String],
                tsCol: String = "ts_ms", userCol: String = "user_id",
                typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val lists = steps.zipWithIndex.map { case (s, i) =>
      sort_array(collect_list(when(col(typeCol) === s, col(tsCol))))
        .as(s"__l$i")
    }
    val grouped = events.groupBy(col(userCol).as("user_id"))
      .agg(lists.head, lists.tail: _*)
    val timed = steps.indices.foldLeft(grouped) { (df, i) =>
      val t =
        if (i == 0) array_min(col("__l0"))
        else array_min(filter(col(s"__l$i"), x => x > col(s"__t${i - 1}")))
      df.withColumn(s"__t$i", t)
    }
    timed.select(col("user_id") +:
      steps.indices.map(i => col(s"__t$i").as(s"t_${steps(i)}")): _*)
  }

  /** The funnel report: `(step_idx, step, users)` — users completing
    * each step in order. One aggregate over [[stepTimes]]. */
  def report(events: DataFrame, steps: Seq[String],
             tsCol: String = "ts_ms", userCol: String = "user_id",
             typeCol: String = "event_type"): DataFrame = {
    val t = stepTimes(events, steps, tsCol, userCol, typeCol)
    val counts = t.agg(
      count(col(s"t_${steps.head}")).as("__c0"),
      steps.indices.tail.map(i =>
        count(col(s"t_${steps(i)}")).as(s"__c$i")): _*)
    val rows = array(steps.indices.map(i => struct(
      lit(i).as("step_idx"), lit(steps(i)).as("step"),
      col(s"__c$i").as("users"))): _*)
    counts.select(explode(rows).as("s"))
      .select(col("s.step_idx").as("step_idx"), col("s.step").as("step"),
        col("s.users").as("users"))
      .orderBy("step_idx")
  }

  /** Cohort retention matrix: users grouped by the period of their
    * FIRST event (the cohort), each later period counting the distinct
    * cohort members still active — `(cohort_period, period_offset,
    * active_users)`, the classic retention triangle.
    *
    * Two aggregates and one equi-join, all keyed on user/cohort: first
    * event per user is a map-side-combinable `min`; the join back is
    * user-keyed (broadcast when the user dimension is small, AQE
    * decides); the final distinct count is per (cohort, offset) —
    * cardinality bounded by periods², rows by user-periods. No windows,
    * no self-join of events against events. */
  def cohorts(events: DataFrame, periodMs: Long,
              tsCol: String = "ts_ms", userCol: String = "user_id")
      : DataFrame = {
    require(periodMs > 0, "cohorts needs a positive period")
    val first = events.groupBy(col(userCol).as("user_id"))
      .agg(floor(min(col(tsCol)) / periodMs).as("cohort_period"))
    events.select(col(userCol).as("user_id"),
        floor(col(tsCol) / periodMs).as("__p"))
      .join(first, Seq("user_id"))
      .groupBy(col("cohort_period"),
        (col("__p") - col("cohort_period")).as("period_offset"))
      .agg(count_distinct(col("user_id")).as("active_users"))
      .orderBy("cohort_period", "period_offset")
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator Catalyst tier for the backward as-of join (SURVEY.md §4
  * option (c): custom `LogicalPlan` + `SparkStrategy` + `SparkPlan` where
  * composition of built-ins leaves efficiency on the table).
  *
  * [[graft.operators.AsOfJoin]] — the default — expresses the semantics
  * as union + window `last(ignoreNulls)`; that plan materializes the
  * unioned relation through a window sort. This native operator is the
  * shape a database would pick: both children hash-clustered on the key
  * and sorted by (key, ts) — requirements DECLARED to the planner, so
  * EnsureRequirements inserts (or elides, when a child is already
  * partitioned) the exchanges — then a single streaming merge pass per
  * partition holds exactly ONE buffered right row, never a unioned
  * schema, never window state. Sorts spill; the merge itself is O(1)
  * memory, so the operator survives any key cardinality or per-key row
  * count. Semantics (ties, tolerance, null right side) are pinned to the
  * Column form by AsOfJoinSpec's equivalence test and the shared DuckDB
  * `ASOF JOIN` oracle.
  *
  * Spark itself has no Scala-facing as-of join: the pandas-on-Spark
  * `merge_asof` lowers into `catalyst.plans.logical.AsOfJoin`, which the
  * optimizer REWRITES into filter + aggregate over a struct min
  * (`RewriteAsOfJoin`) — a per-pair materialization this exec avoids.
  */
object AsOfJoinPlan {

  /** Backward as-of join through the native operator. Same contract as
    * [[graft.operators.AsOfJoin.backward]] (`rightTs <= leftTs`, ties
    * match, `tolerance` bounds the lag, right side NULL on no match)
    * except the output carries ALL right columns rather than a payload
    * selection — project afterwards. Ordering columns must be numeric
    * (cast upstream; epoch millis is the house convention). The right
    * side must not share attributes with the left (re-alias a self-join
    * side first), and right column names should not collide with left
    * ones (rename before joining — the output carries both sides);
    * duplicate right rows at one (key, ts) resolve to the LAST in
    * (key, ts, right-row) sort order rather than the greatest payload
    * struct — dedup the right side first where that matters. */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: Seq[String], rightKey: Seq[String],
               leftTs: String, rightTs: String,
               tolerance: Long = 0L): DataFrame = {
    require(leftKey.nonEmpty && leftKey.size == rightKey.size,
      "as-of join requires matching, non-empty key column lists")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = PlanBridge.analyzed(
      left.withColumn(leftTs, col(leftTs).cast("long")))
    val rp = PlanBridge.analyzed(
      right.withColumn(rightTs, col(rightTs).cast("long")))
    require(lp.outputSet.intersect(rp.outputSet).isEmpty,
      "as-of join sides share attributes; re-alias the right side " +
        "(select with new column names) before joining")
    def resolve(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column '$n' not found among ${p.output.map(_.name).mkString(", ")}"))
    PlanBridge.ofRows(spark, AsOfJoinNode(lp, rp,
      leftKey.map(resolve(lp, _)), rightKey.map(resolve(rp, _)),
      resolve(lp, leftTs), resolve(rp, rightTs), tolerance))
  }

  /** Idempotently add the planner strategy to a live session (the
    * no-config path; `GraftExtensions` injects it at session build). */
  def ensureStrategy(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }
}

/** Logical backward as-of join: left rows decorated with the most recent
  * right row per key at `rightTs <= leftTs` (within `tolerance` when
  * > 0). Purely declarative — [[AsOfJoinStrategy]] picks the physical
  * form. */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        tolerance: Long)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]; contributes nothing for
  * other nodes. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tol) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join. Children are hash-clustered on their keys and
  * sorted by (keys, ts) — EnsureRequirements materializes both — then one
  * forward pass per co-partition: right rows are consumed until they pass
  * the current left row's timestamp, remembering only the latest
  * qualifying row. O(|L| + |R|) per partition, one buffered right row of
  * state. */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        tolerance: Long)
    extends BinaryExecNode {

  require(Seq(leftTs, rightTs).forall(
    e => e.dataType == LongType || e.dataType == TimestampType),
    "as-of ordering columns must be long or timestamp")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val tol = tolerance
    val rightWidth = right.output.size
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(leftKeys, left.output)
      val rKey = UnsafeProjection.create(rightKeys, right.output)
      val lTsP = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsP = UnsafeProjection.create(Seq(rightTs), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // the single piece of merge state: latest right row at or before
      // the left cursor, with its key and timestamp (rows are copied out
      // of the child's reused UnsafeRow buffers)
      var matchRow: InternalRow = null
      var matchKey: InternalRow = null
      var matchTs = 0L
      lIter.map { lRow =>
        val lk = lKey(lRow)
        val lTsRow = lTsP(lRow)
        val lNull = lTsRow.isNullAt(0)
        val lts = if (lNull) 0L else lTsRow.getLong(0)
        var done = lNull // a null left ts joins to nothing
        while (!done && rBuf.hasNext) {
          val cmp = keyOrd.compare(rKey(rBuf.head), lk)
          if (cmp < 0) rBuf.next() // right key already passed: discard
          else if (cmp > 0) done = true
          else {
            val rTsRow = rTsP(rBuf.head)
            if (rTsRow.isNullAt(0)) rBuf.next() // null right ts: skip
            else {
              val rts = rTsRow.getLong(0)
              if (rts <= lts) {
                matchRow = rBuf.next().copy()
                matchKey = rKey(matchRow).copy()
                matchTs = rts
              } else done = true
            }
          }
        }
        val matched = !lNull && matchRow != null &&
          keyOrd.compare(matchKey, lk) == 0 &&
          (tol <= 0L || lts - matchTs <= tol)
        joined(lRow, if (matched) matchRow else nullRight)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

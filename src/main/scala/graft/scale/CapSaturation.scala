package graft.scale

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.{CollectMetricsExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Loud telemetry for the LSH bucket-cap skew guard (`maxBucket`).
  *
  * The cap exists to stop one hot bucket from turning the candidate
  * self-join quadratic, and at benign cap rates its recall loss is
  * confined to boilerplate clusters. But when the BAND SPACE saturates —
  * the measured 47-bit simhash failure at 5M docs, where candidate pairs
  * FELL 9.6k→2.5k for 10× documents — most buckets blow past the cap and
  * the guard silently censors the corpus instead of trimming skew. That
  * is a recall collapse with no in-band signal: the query succeeds,
  * faster than ever, with quietly wrong coverage.
  *
  * This guard makes saturation loud without a second pass: the hot-list
  * aggregation every capped operator already computes gets a
  * `Dataset.observe` node (accumulator-backed, evaluated as rows stream
  * past — zero extra jobs), and a once-per-session
  * [[QueryExecutionListener]] checks the observed row after each action.
  * When more than `spark.graft.capSaturation.warnFraction` (default 1%)
  * of buckets exceed the cap, a warning naming the drop fractions and
  * the wide-tier escape hatches prints to stderr and is retained for
  * inspection ([[drainWarnings]] — spec-pinned). Streaming faces are
  * covered by the same listener: the foreachBatch ingest faces
  * ([[graft.streaming.CurationStream]]) execute each micro-batch as a
  * batch action on the same session, so the observe node fires through
  * this listener there too (spec-pinned in CurationStreamSpec); a plan
  * that instead carries the observation INSIDE a streaming query would
  * read it from `StreamingQueryProgress.observedMetrics`.
  */
object CapSaturation {

  /** Observation-name prefix the listener reacts to; the suffix keeps
    * names unique when one plan caps several bucket frames (e.g. the
    * incremental store and batch sides of [[graft.pipeline.IncrementalDedup]]). */
  private val MetricPrefix = "graft_cap_saturation_"
  private val seq = new AtomicLong
  private val warningsQ = new ConcurrentLinkedQueue[String]
  // warn once per observation: one capBuckets call site = one name, and
  // a re-executed cached plan (bench passes, incremental re-ingest of
  // the same store plan) re-reports the same saturation fact
  private val warned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // WEAK keys: this static set must not pin sessions for the JVM
  // lifetime — a serving process creating per-client sessions
  // (spark.newSession(), the multi-session posture ConcurrentBench
  // models) would otherwise leak every session (and its whole state)
  // plus one listener each. A collected session's listener dies with
  // it; a live session stays in the set. Guarded by `installed` for
  // atomicity (WeakHashMap is not thread-safe).
  private val installed =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  /** Conf key for the warn threshold on (over-cap buckets / buckets). */
  val WarnFractionKey = "spark.graft.capSaturation.warnFraction"

  /** Wrap the per-bucket size frame (`bucketCol`, `bsize`) with the
    * saturation observation and make sure this session's listener is on.
    * The caller filters `bsize > maxBucket` downstream as before — the
    * observe node rides the hot-list job that already runs. */
  def observed(stats: DataFrame, maxBucket: Long,
               bucketCol: String): DataFrame = {
    install(stats.sparkSession)
    stats.observe(MetricPrefix + seq.incrementAndGet(),
      count(lit(1)).as("buckets_total"),
      count(when(col("bsize") > maxBucket, lit(1))).as("buckets_over"),
      coalesce(sum(col("bsize")), lit(0L)).as("rows_total"),
      coalesce(sum(when(col("bsize") > maxBucket, col("bsize"))), lit(0L))
        .as("rows_dropped"),
      max(lit(maxBucket)).as("cap"),
      max(lit(bucketCol)).as("bucket_col"))
  }

  private def install(spark: SparkSession): Unit =
    if (installed.synchronized(installed.add(spark)))
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit =
          metricRows(qe).foreach { case (name, row) => check(spark, name, row) }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      })

  /** Saturation metric rows for one execution. `qe.observedMetrics` alone
    * is NOT enough: when the cap censors EVERYTHING (total saturation —
    * the case that most needs the warning), the candidate result is
    * empty, AQE's empty-relation propagation replaces the whole subtree
    * with an empty scan, and the CollectMetrics node vanishes from the
    * final plan along with its observed row — measured, not theoretical.
    * The accumulator DID run inside the already-materialized hot-list
    * broadcast stage, so walk the AQE initial plan (public API) and read
    * each node's `collectedMetrics` directly; a never-executed node
    * reports buckets_total=0 and is skipped by [[check]], so the
    * fallback can under-warn but never false-warn. */
  private def metricRows(qe: QueryExecution): Map[String, Row] = {
    val buf = mutable.Map.empty[String, Row]
    def walk(p: SparkPlan): Unit = {
      p match {
        case c: CollectMetricsExec if c.name.startsWith(MetricPrefix) =>
          // several clones of one observation coexist (initial plan,
          // replanned final plan, materialized stage); only the one that
          // RAN has nonzero counts — keep the largest-total row
          val row = c.collectedMetrics
          val prev = buf.get(c.name)
          if (prev.forall(_.getAs[Long]("buckets_total")
                < row.getAs[Long]("buckets_total")))
            buf.put(c.name, row)
        case a: AdaptiveSparkPlanExec =>
          walk(a.initialPlan); walk(a.executedPlan)
          // replanning clones physical nodes, so the instance that RAN
          // may survive only inside an already-materialized stage
          a.context.stageCache.values.foreach(s => walk(s.plan))
        case q: QueryStageExec => walk(q.plan)
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(qe.executedPlan)
    // the observed row (when the node survived) is authoritative
    buf.toMap ++ qe.observedMetrics.filter(_._1.startsWith(MetricPrefix))
  }

  private def check(spark: SparkSession, name: String, row: Row): Unit = {
    val bucketsTotal = row.getAs[Long]("buckets_total")
    val bucketsOver = row.getAs[Long]("buckets_over")
    if (bucketsTotal <= 0L || bucketsOver <= 0L) return
    val overFrac = bucketsOver.toDouble / bucketsTotal
    val warnFrac =
      try spark.conf.get(WarnFractionKey, "0.01").toDouble
      catch { case _: NumberFormatException => 0.01 }
    if (overFrac <= warnFrac) return
    if (!warned.add(name)) return
    val rowsTotal = row.getAs[Long]("rows_total")
    val rowsDropped = row.getAs[Long]("rows_dropped")
    val dropFrac =
      if (rowsTotal > 0L) rowsDropped.toDouble / rowsTotal else 0.0
    val msg = f"[graft] BUCKET-SATURATION: $bucketsOver%d of $bucketsTotal%d " +
      f"'${row.getAs[String]("bucket_col")}' buckets (${overFrac * 100}%.1f%%) " +
      f"exceed maxBucket=${row.getAs[Long]("cap")}%d, censoring " +
      f"${dropFrac * 100}%.1f%% of membership rows — the band space is " +
      "saturating and the skew cap is silently collapsing recall (the " +
      "measured 47-bit simhash signature at 5M docs). Move to a wider " +
      "signature tier (simhashCandidatesWide / more bands), or keep hot " +
      "buckets losslessly with tileTarget instead of the cap."
    warningsQ.add(msg)
    System.err.println(msg)
  }

  /** Return and clear the retained warnings (spec + operator surface).
    * Listener delivery is asynchronous — pollers should retry briefly. */
  def drainWarnings(): Seq[String] = {
    val out = Iterator.continually(warningsQ.poll()).takeWhile(_ != null)
      .toVector
    out
  }
}

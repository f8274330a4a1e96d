package graft.scale

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Zero-extra-pass pipeline instrumentation: named metric rows ride the
  * job that is already running, via `Dataset.observe` (a CollectMetrics
  * node — accumulator-backed, evaluated as rows stream past). The
  * alternative — a `count()` / aggregate per stage boundary — is a
  * second full scan per metric, which at 100 TB turns "how many rows
  * survived the gate" into hours of duplicate work.
  *
  * Batch: metrics arrive on the [[QueryExecutionListener]] after the
  * action ([[collect]] wraps the register/await/unregister dance).
  * Streaming: the SAME observe calls surface per-micro-batch in
  * `StreamingQueryProgress.observedMetrics` — no separate wiring.
  */
object Observe {

  /** Row counter at a stage boundary. */
  def counted(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("rows"))

  /** Arbitrary aggregate metrics at a stage boundary (must be
    * deterministic aggregates over the observed plan's output). */
  def metrics(df: DataFrame, name: String, first: Column, rest: Column*): DataFrame =
    df.observe(name, first, rest: _*)

  /** Run `action`, return its value plus every observed-metrics row the
    * triggered query executions reported, keyed by observation name.
    * Listener delivery is asynchronous — polls up to `timeoutMs`. */
  def collect[T](spark: SparkSession, expected: Int = 1,
                 timeoutMs: Long = 10000L)(action: => T): (T, Map[String, Row]) = {
    val acc = TrieMap.empty[String, Row]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) => acc.put(k, v) }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = action
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (acc.size < expected && System.nanoTime() < deadline)
        Thread.sleep(20)
      (result, acc.toMap)
    } finally spark.listenerManager.unregister(listener)
  }
}

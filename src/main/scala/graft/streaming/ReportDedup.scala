package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch report deduplication state (SURVEY.md §2.6 ST1/ST2).
  *
  * Reference: ports_scan.py:56-77,109-141 (+ ssh_auth_simple.py:61-81,
  * dns_external_resolvers.py:49-69) — a driver-global dict keyed by attack
  * id holding (last_logged, flows_total): re-report only when a window has
  * passed, emit the increment since the last report, GC idle entries.
  *
  * Spark-first: partitioned keyed state via flatMapGroupsWithState —
  * nothing driver-global, checkpointable (the reference lost all state on
  * restart), GC via state timeout instead of a daily sweep.
  */
object ReportDedup {

  /** A detection observation: key = attack identity (e.g. "src|dst|port"),
    * ts = event-time ms, flows = flow count in this observation. */
  final case class Observation(key: String, ts: Long, flows: Long)

  /** Emitted report: cumulative total + increment since previous report. */
  final case class Report(key: String, ts: Long, flows_total: Long,
                          flows_increment: Long)

  final case class DedupState(lastReportTs: Long, flowsTotal: Long,
                              flowsAtLastReport: Long)

  /** Flat-map one key's new observations against its state.
    * Re-report when ≥ `reportIntervalMs` passed since the last report
    * (reference: "at least one window newer"). */
  def update(reportIntervalMs: Long, gcMs: Long)(
      key: String, rows: Iterator[Observation],
      state: GroupState[DedupState]): Iterator[Report] = {
    if (state.hasTimedOut) { // GC: reference's daily sweep of stale entries
      state.remove()
      return Iterator.empty
    }
    val obs = rows.toSeq.sortBy(_.ts)
    if (obs.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(DedupState(Long.MinValue, 0L, 0L))
    val out = Seq.newBuilder[Report]
    for (o <- obs) {
      st = st.copy(flowsTotal = st.flowsTotal + o.flows)
      if (st.lastReportTs == Long.MinValue ||
          o.ts - st.lastReportTs >= reportIntervalMs) {
        out += Report(key, o.ts, st.flowsTotal, st.flowsTotal - st.flowsAtLastReport)
        st = st.copy(lastReportTs = o.ts, flowsAtLastReport = st.flowsTotal)
      }
    }
    state.update(st)
    if (gcMs > 0) state.setTimeoutDuration(gcMs)
    out.result().iterator
  }

  /** Wire the state function over a keyed stream. */
  def apply(obs: Dataset[Observation], reportIntervalMs: Long,
            gcMs: Long = 0L): Dataset[Report] = {
    implicit val se: Encoder[DedupState] = Encoders.product[DedupState]
    implicit val re: Encoder[Report] = Encoders.product[Report]
    import obs.sparkSession.implicits._
    val timeout =
      if (gcMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(update(reportIntervalMs, gcMs))
  }
}

package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.BitFunctions

/** External DNS resolver usage: a client's DNS answer followed by TCP
  * activity from that client within a time tolerance — a time-proximity
  * (as-of/interval) join.
  *
  * Reference: applications/detection/dns_external_resolvers/spark/
  * dns_external_resolvers.py:149-166 — DNS answers joined to TCP flows with
  * |t_tcp − t_dns| ≤ 5000 ms (SURVEY.md §2.3 J4). Implemented as an
  * equi-join on the client key plus a range predicate — Spark executes the
  * equi-part as a hash join with the range as post-filter; in streaming the
  * same predicate works as a watermarked stream-stream interval join.
  *
  * Scale note: the equi-key (client ip) carries the shuffle; the ±window
  * range never forces a cartesian because the key join happens first.
  */
object DnsExternalResolvers {

  /** Flow columns this analytic consumes (see ProtocolStatistics.inputCols). */
  val inputCols: Seq[String] = Seq("protocol", "dns_flags", "src_ip4",
    "dst_ip", "flow_id", "start_ms", "end_ms")

  def apply(flows: DataFrame, toleranceMs: Long = 5000L): DataFrame = {
    val dns = flows
      .filter(col("protocol") === 17 && col("dns_flags").isNotNull &&
        BitFunctions.dnsIsResponse(col("dns_flags")) && col("src_ip4").isNotNull)
      .select(
        col("src_ip4").as("client_ip"),
        col("dst_ip").as("resolver_ip"),
        col("end_ms").as("dns_end_ms"))
    val tcp = flows
      .filter(col("protocol") === 6 && col("src_ip4").isNotNull)
      .select(
        col("src_ip4").as("client_ip"),
        col("flow_id").as("tcp_flow_id"),
        col("start_ms").as("tcp_start_ms"))

    tcp.join(dns, Seq("client_ip"))
      .filter(col("tcp_start_ms") >= col("dns_end_ms") &&
        col("tcp_start_ms") <= col("dns_end_ms") + toleranceMs)
      .groupBy("client_ip", "resolver_ip")
      .agg(
        count(lit(1)).as("flows"),
        count_distinct(col("tcp_flow_id")).as("distinct_tcp_flows"),
        max("tcp_start_ms").as("last_seen_ms"))
  }
}

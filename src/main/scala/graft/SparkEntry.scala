package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{FlowSynth, Graft, Tables}
import graft.analytics._
import graft.functions.DnsFunctions

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a DataFrame pipeline over the driver's
  * parquet testdata; [[oracleSql]] holds the equivalent DuckDB SQL. The
  * Stream4Flow-semantics operators run over a flow view synthesized
  * deterministically from `events` (see [[graft.core.FlowSynth]]) so they
  * are oracle-checkable too.
  *
  * Convention: every output column is explicitly aliased identically on
  * both sides; doubles are round()ed; results carry a deterministic
  * ORDER BY (the sort is optimized away under Bench's count()).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Graft.tune(spark)
    HostStats(FlowSynth.flows(spark, "/root/testdata/sf0.001"))
  }

  private def flows(s: SparkSession, d: String): DataFrame = {
    Graft.tune(s)
    FlowSynth.flows(s, d)
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational core over TPC-H-ish tables -------------------------
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // --- flow synthesis parity (the CTE itself) ------------------------
    "q_flows_synth" -> ((s, dir) => flows(s, dir).orderBy("flow_id")),

    // --- Stream4Flow analytics (SURVEY §2) -----------------------------
    "q_protocols_statistics" -> ((s, dir) =>
      ProtocolStatistics(flows(s, dir), 3600000L)
        .orderBy("window_start_ms", "protocol")),

    "q_host_stats" -> ((s, dir) =>
      HostStats(flows(s, dir)).orderBy("src_ip")),

    "q_top_n_host_stats" -> ((s, dir) =>
      TopNHostStats(flows(s, dir), 10)
        .orderBy("src_ip", "stat_type", "rank")),

    "q_portscan" -> ((s, dir) =>
      PortScanDetection(flows(s, dir), minTargets = 2)
        .orderBy("scan_type", "src_ip", "key")),

    "q_ssh_auth" -> ((s, dir) =>
      SshAuthDetection(flows(s, dir), minFlows = 1)
        .orderBy("src_ip", "dst_ip")),

    "q_dns_statistics" -> ((s, dir) =>
      DnsStatistics(flows(s, dir), topN = 100)
        .orderBy(col("stat_type"), col("value").desc, col("key"))),
  )

  /** Headline queries Bench runs at sf0.1. */
  val benchQueries: Seq[String] = Seq(
    "q1_agg", "q_protocols_statistics", "q_host_stats",
    "q_top_n_host_stats", "q_dns_statistics")

  // ---------------------------------------------------------------------
  // DuckDB oracles. `flows` CTE = FlowSynth.cteSql (identical mapping).
  // ---------------------------------------------------------------------

  private val protoNameSql =
    "CASE WHEN protocol = 6 THEN 'tcp' WHEN protocol = 17 THEN 'udp' ELSE 'other' END"
  private val srcIpSql = "COALESCE(src_ip4, src_ip6)"

  private def caseFromMap(m: Map[Int, String], keyExpr: String, default: String): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN $k THEN '$v'" }
      .mkString(s"CASE $keyExpr ", " ", s" ELSE '$default' END")

  private val flagSumsSql = graft.functions.BitFunctions.tcpFlagNames.zipWithIndex
    .map { case (n, i) =>
      s"CAST(SUM(CASE WHEN protocol = 6 THEN (tcp_flags >> $i) & 1 ELSE 0 END) AS BIGINT) AS flag_${n.toLowerCase}"
    }.mkString(",\n        ")

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_flows_synth" -> FlowSynth.oracle("SELECT * FROM flows ORDER BY flow_id"),

    "q_protocols_statistics" -> FlowSynth.oracle(
      s"""SELECT start_ms - (start_ms % 3600000) AS window_start_ms,
         |  $protoNameSql AS protocol,
         |  count(*) AS flows,
         |  CAST(sum(packets) AS BIGINT) AS packets,
         |  CAST(sum(bytes) AS BIGINT) AS bytes
         |FROM flows
         |WHERE protocol IS NOT NULL AND packets IS NOT NULL
         |  AND bytes IS NOT NULL AND start_ms IS NOT NULL
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q_host_stats" -> FlowSynth.oracle(
      s"""SELECT $srcIpSql AS src_ip,
         |  count(*) AS flows,
         |  CAST(sum(packets) AS BIGINT) AS packets,
         |  CAST(sum(bytes) AS BIGINT) AS bytes,
         |  round(avg(end_ms - start_ms) / 1000, 4) AS avg_duration_s,
         |  count(DISTINCT dst_port) AS dport_count,
         |  count(DISTINCT dst_ip) AS peer_number,
         |  $flagSumsSql
         |FROM flows
         |WHERE $srcIpSql IS NOT NULL AND packets IS NOT NULL AND bytes IS NOT NULL
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    "q_top_n_host_stats" -> FlowSynth.oracle(
      s"""WITH e AS (
         |  SELECT $srcIpSql AS src_ip, 'dst_port' AS stat_type,
         |         CAST(dst_port AS VARCHAR) AS key FROM flows
         |  UNION ALL
         |  SELECT $srcIpSql, 'dst_ip', dst_ip FROM flows
         |  UNION ALL
         |  SELECT $srcIpSql, 'http_host', http_host FROM flows
         |), c AS (
         |  SELECT src_ip, stat_type, key, count(*) AS flows FROM e
         |  WHERE src_ip IS NOT NULL AND key IS NOT NULL
         |  GROUP BY 1, 2, 3
         |)
         |SELECT src_ip, stat_type, key, flows, CAST(rank AS INT) AS rank FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY src_ip, stat_type ORDER BY flows DESC, key ASC) AS rank
         |  FROM c) WHERE rank <= 10
         |ORDER BY src_ip, stat_type, rank""".stripMargin),

    "q_portscan" -> FlowSynth.oracle(
      """WITH syn AS (
        |  SELECT * FROM flows
        |  WHERE protocol = 6 AND tcp_flags IS NOT NULL AND (tcp_flags & 31) = 2
        |    AND src_ip4 IS NOT NULL AND dst_ip IS NOT NULL AND dst_port IS NOT NULL
        |), h AS (
        |  SELECT 'horizontal' AS scan_type, src_ip4 AS src_ip,
        |         CAST(dst_port AS VARCHAR) AS key, count(*) AS flows,
        |         count(DISTINCT dst_ip) AS targets_total,
        |         CAST(max(end_ms) - min(start_ms) AS BIGINT) AS duration_ms
        |  FROM syn GROUP BY 2, 3 HAVING count(DISTINCT dst_ip) >= 2
        |), v AS (
        |  SELECT 'vertical' AS scan_type, src_ip4 AS src_ip,
        |         dst_ip AS key, count(*) AS flows,
        |         count(DISTINCT dst_port) AS targets_total,
        |         CAST(max(end_ms) - min(start_ms) AS BIGINT) AS duration_ms
        |  FROM syn GROUP BY 2, 3 HAVING count(DISTINCT dst_port) >= 2
        |)
        |SELECT * FROM h UNION ALL SELECT * FROM v
        |ORDER BY scan_type, src_ip, key""".stripMargin),

    "q_ssh_auth" -> FlowSynth.oracle(
      s"""SELECT $srcIpSql AS src_ip, dst_ip,
         |  count(*) AS flows,
         |  round(avg(packets), 4) AS average_packet_count,
         |  CAST(max(end_ms) - min(start_ms) AS BIGINT) AS duration_ms
         |FROM flows
         |WHERE protocol = 6 AND dst_port = 22 AND src_port > 1024
         |  AND packets > 10 AND packets < 20
         |  AND bytes > 1800 AND bytes < 5000
         |  AND (end_ms - start_ms) < 12000
         |GROUP BY 1, 2 HAVING count(*) >= 1
         |ORDER BY 1, 2""".stripMargin),

    "q_dns_statistics" -> FlowSynth.oracle(
      s"""WITH dns AS (
         |  SELECT *, ((dns_flags >> 15) & 1) = 1 AS is_resp, dns_flags & 15 AS rcode
         |  FROM flows WHERE dns_name IS NOT NULL AND dns_flags IS NOT NULL
         |), e AS (
         |  SELECT 'queried_domain' AS stat_type,
         |         CASE WHEN NOT is_resp THEN dns_name END AS key FROM dns
         |  UNION ALL
         |  SELECT 'qtype', CASE WHEN NOT is_resp THEN
         |    ${caseFromMap(DnsFunctions.qtypeNames, "dns_qtype", "OTHER")} END FROM dns
         |  UNION ALL
         |  SELECT 'rcode', CASE WHEN is_resp THEN
         |    ${caseFromMap(DnsFunctions.rcodeNames, "rcode", "Unknown")} END FROM dns
         |  UNION ALL
         |  SELECT 'nxdomain_by_domain',
         |         CASE WHEN is_resp AND rcode = 3 THEN dns_name END FROM dns
         |  UNION ALL
         |  SELECT 'queried_by_ip',
         |         CASE WHEN NOT is_resp THEN $srcIpSql END FROM dns
         |)
         |SELECT stat_type, key, value FROM (
         |  SELECT stat_type, key, count(*) AS value,
         |         row_number() OVER (PARTITION BY stat_type
         |           ORDER BY count(*) DESC, key ASC) AS rank
         |  FROM e WHERE key IS NOT NULL GROUP BY 1, 2)
         |WHERE rank <= 100
         |ORDER BY stat_type, value DESC, key""".stripMargin),
  )
}

package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.NetFunctions

/** Per-host top-N rankings: dst ports, dst IPs, HTTP hosts by flow count.
  *
  * Reference: applications/statistics/hosts_statistics/spark/
  * top_n_host_stats.py:155-202 — three keyed counts, list-concat
  * reduceByKey, driver-side sort+slice (:117-126). Spark-first: one
  * explode over the three key kinds → single groupBy count → ranked window
  * function, all distributed (SURVEY.md §2.7 T1). Ties break by key asc for
  * determinism (reference Counter ties are insertion-ordered — SURVEY §7.4).
  *
  * Scale note: row_number over (src_ip, stat_type) partitions — no global
  * sort; skew-bounded because per-host key cardinality is bounded by the
  * port/peer space.
  */
object TopNHostStats {

  /** Flow columns this analytic consumes (see ProtocolStatistics.inputCols). */
  val inputCols: Seq[String] = Seq("src_ip4", "src_ip6", "dst_ip", "dst_port",
    "http_host")

  /** The three-way key fanout (dst_port / dst_ip / http_host per source
    * host). `carry` columns (e.g. event_time for streaming windows) ride
    * along — shared by the batch rank and the streaming counts builder. */
  def contributions(flows: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val src = NetFunctions.ipCoalesce(col("src_ip4"), col("src_ip6"))
    flows
      .filter(src.isNotNull)
      .select(src.as("src_ip") +: explode(array(
        struct(lit("dst_port").as("stat_type"), col("dst_port").cast("string").as("key")),
        struct(lit("dst_ip").as("stat_type"), col("dst_ip").as("key")),
        struct(lit("http_host").as("stat_type"), col("http_host").as("key"))
      )).as("kv") +: carry.map(col): _*)
      .select(col("src_ip") +: col("kv.stat_type") +: col("kv.key") +: carry.map(col): _*)
      .filter(col("key").isNotNull)
  }

  def apply(flows: DataFrame, n: Int): DataFrame = {
    val counted = contributions(flows).groupBy("src_ip", "stat_type", "key")
      .agg(count(lit(1)).as("flows"))
    counted
      .withColumn("rank", row_number().over(
        Window.partitionBy("src_ip", "stat_type")
          .orderBy(col("flows").desc, col("key").asc)))
      .filter(col("rank") <= n)
  }
}

package graft.results

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed result documents (SURVEY.md §1.3) + the date-partitioned store
  * that replaces the reference's daily Elasticsearch indices.
  *
  * Each analytic's flat output is shaped into the reference's `@type`
  * document: nested `stats` structs (host_stats.py:79-133), `data_array`
  * as array-of-struct — the exact relational dual of the ES `nested`
  * mapping (logstash template :95-115); `explode` recovers rows at query
  * time (ReadSide.nestedTopN). Storage is parquet partitioned by `day`,
  * so Catalyst partition pruning replaces ES daily-index selection, and
  * min/max row-group stats replace doc_values skipping.
  */
object Documents {

  /** host_stats flat row → nested @type=host_stats document. */
  def hostStatsDoc(hostStats: DataFrame, tsMs: Column): DataFrame = {
    val flagCols = graft.functions.BitFunctions.tcpFlagNames
      .map(n => s"flag_${n.toLowerCase}")
    hostStats.select(
      lit("host_stats").as("@type"),
      timestamp_millis(tsMs).as("@timestamp"),
      col("src_ip"),
      struct(
        struct(col("packets"), col("bytes"), col("flows").as("flow")).as("total"),
        col("avg_duration_s").as("avg_flow_duration"),
        col("dport_count"),
        col("peer_number"),
        struct(flagCols.map(c => col(c).as(c.stripPrefix("flag_").toUpperCase)): _*)
          .as("tcp_flags"))
        .as("stats"))
  }

  /** (stat_type, key, value[, ip]) rows → @type doc with `data_array`
    * nested array-of-struct (dns_statistics.py:55-100 shape). */
  def dataArrayDoc(stats: DataFrame, atType: String, tsMs: Column,
                   withIp: Boolean = false): DataFrame = {
    val entry =
      if (withIp) struct(col("key"), col("value"), col("ip"))
      else struct(col("key"), col("value"))
    stats
      .groupBy(col("stat_type"))
      .agg(sort_array(collect_list(entry)).as("data_array"))
      .select(
        lit(atType).as("@type"),
        timestamp_millis(tsMs).as("@timestamp"),
        col("stat_type").as("@stat_type"),
        col("data_array"))
  }

  /** host_daily_profile rows (src_ip, day_start_ms, hour_slot, stats…) →
    * the reference's 24-slot temporal-profile document
    * (host_daily_profile.py:155-190): one row per (src_ip, day) with a
    * dense 24-entry array, zero-filled for silent hours. Event-time hour
    * indexing replaces the reference's INCREMENT-modulo slotting
    * (SURVEY §7.4.5). */
  def dailyProfileDoc(profile: DataFrame): DataFrame = {
    val slotted = profile
      .groupBy(col("src_ip"), col("day_start_ms"))
      .agg(map_from_entries(collect_list(struct(col("hour_slot"),
        struct(col("packets"), col("bytes"), col("flows"))))).as("by_hour"))
    slotted.select(
      lit("host_stats_temporal_profile").as("@type"),
      timestamp_millis(col("day_start_ms")).as("@timestamp"),
      col("src_ip").as("src_ipv4"),
      transform(sequence(lit(0), lit(23)), h =>
        coalesce(element_at(col("by_hour"), h.cast("int")),
          struct(lit(0L).as("packets"), lit(0L).as("bytes"), lit(0L).as("flows"))))
        .as("stats"))
  }

  /** Write documents date-partitioned (daily ES index replacement). */
  def writeDaily(docs: DataFrame, path: String): Unit =
    docs
      .withColumn("day", date_format(col("@timestamp"), "yyyy-MM-dd"))
      .write.mode("append").partitionBy("day").parquet(path)

  /** Read back with partition pruning for a day range (inclusive). */
  def readDaily(spark: org.apache.spark.sql.SparkSession, path: String,
                fromDay: String, toDay: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("day") >= fromDay && col("day") <= toDay)
}

package graft

import org.apache.spark.sql.functions._
import graft.analytics.HostStats
import graft.queries.ReadSide
import graft.results.Documents

class ResultsSpec extends SparkSpec {
  import spark.implicits._

  test("hostStatsDoc: nested @type document shape + field values") {
    val flows = Fx.df(spark,
      Fx(flow_id = 1, src_ip4 = "10.0.0.1", dst_ip = "192.0.2.1",
        dst_port = 80, packets = 10, bytes = 1000, tcp_flags = 2),
      Fx(flow_id = 2, src_ip4 = "10.0.0.1", dst_ip = "192.0.2.2",
        dst_port = 443, packets = 5, bytes = 700, tcp_flags = 16))
    val doc = Documents.hostStatsDoc(HostStats(flows), lit(1700000000000L))
    val r = doc.selectExpr("`@type`", "src_ip", "stats.total.packets",
      "stats.total.flow", "stats.peer_number", "stats.tcp_flags.SYN",
      "stats.tcp_flags.ACK").head()
    assert(r.getString(0) == "host_stats")
    assert(r.getString(1) == "10.0.0.1")
    assert(r.getLong(2) == 15L && r.getLong(3) == 2L && r.getLong(4) == 2L)
    assert(r.getLong(5) == 1L && r.getLong(6) == 1L)
  }

  test("dataArrayDoc round-trips through nestedTopN (ES nested dual)") {
    val stats = Seq(
      ("qtype", "A", 30L), ("qtype", "AAAA", 12L), ("qtype", "MX", 5L),
      ("rcode", "NoError", 40L), ("rcode", "NXDomain", 2L))
      .toDF("stat_type", "key", "value")
    val docs = Documents.dataArrayDoc(stats, "dns_statistics", lit(1700000000000L))
    assert(docs.count() == 2) // one doc per stat_type
    val top = ReadSide.nestedTopN(docs, 2).orderBy("stat_type", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(3)))
    assert(top.toSeq == Seq(
      ("qtype", "A", 1), ("qtype", "AAAA", 2),
      ("rcode", "NoError", 1), ("rcode", "NXDomain", 2)))
  }

  test("writeDaily/readDaily: date partitioning prunes the scan") {
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    val stats = Seq(("t", "k", 1L)).toDF("stat_type", "key", "value")
    Documents.writeDaily(
      Documents.dataArrayDoc(stats, "x", lit(1700000000000L)), dir) // 2023-11-14
    Documents.writeDaily(
      Documents.dataArrayDoc(stats, "x", lit(1700950000000L)), dir) // 2023-11-25
    val pruned = Documents.readDaily(spark, dir, "2023-11-14", "2023-11-14")
    assert(pruned.count() == 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"))
  }

  test("dailyProfileDoc: dense 24-slot array, zero-filled silent hours") {
    val profile = Seq(
      ("10.0.0.1", 0L, 3, 100L, 1000L, 2L),
      ("10.0.0.1", 0L, 23, 50L, 500L, 1L))
      .toDF("src_ip", "day_start_ms", "hour_slot", "packets", "bytes", "flows")
    val doc = Documents.dailyProfileDoc(profile)
    val r = doc.selectExpr("src_ipv4", "size(stats)",
      "stats[3].packets", "stats[23].flows", "stats[0].packets").head()
    assert(r.getString(0) == "10.0.0.1")
    assert(r.getInt(1) == 24)
    assert(r.getLong(2) == 100L && r.getLong(3) == 1L && r.getLong(4) == 0L)
  }

  test("full chain: streaming host stats -> nested doc -> daily store -> read-side query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("chain").toString
    val mem = MemoryStream[Fx]
    val stats = graft.streaming.StreamingAnalytics.hostStats(
      graft.streaming.FlowSource.withEventTime(mem.toDF()),
      window = "10 seconds", slide = "10 seconds")
    val q = graft.streaming.ResultSink.foreachBatch(stats) { (batch, _) =>
      if (!batch.isEmpty)
        Documents.writeDaily(
          Documents.hostStatsDoc(
            batch.withColumn("src_ip", col("src_ip")),
            col("window.start").cast("long") * 1000L),
          store)
    }.start()
    try {
      mem.addData(
        Fx(flow_id = 1, src_ip4 = "10.0.0.1", packets = 10, bytes = 500,
          start_ms = 1700000000000L),
        Fx(flow_id = 2, src_ip4 = "10.0.0.1", packets = 4, bytes = 200,
          start_ms = 1700000002000L),
        // watermark push so the window closes
        Fx(flow_id = 9, src_ip4 = "10.0.0.9", start_ms = 1700000100000L))
      q.processAllAvailable()
      val day = "2023-11-14"
      val docs = Documents.readDaily(spark, store, day, day)
      val r = docs.filter(col("src_ip") === "10.0.0.1")
        .selectExpr("stats.total.packets", "stats.total.flow").head()
      assert(r.getLong(0) == 14L && r.getLong(1) == 2L)
      // read-side heatmap over the stored documents
      val heat = ReadSide.groupSum(docs, col("src_ip"),
        col("stats.total.flow")).collect()
      assert(heat.head.getString(0) == "10.0.0.1")
    } finally q.stop()
  }

  test("ReadSide.minAvgMax and groupSum and distinctCount shapes") {
    val df = Seq(
      (1000L, "a", 1.0, "u1"), (2000L, "a", 3.0, "u2"),
      (61000L, "b", 5.0, "u1"), (62000L, "b", 7.0, "u1"))
      .toDF("ts_ms", "k", "v", "user")
    val mam = ReadSide.minAvgMax(df, col("ts_ms"), 60000L, col("v"))
      .orderBy("bucket_ms").collect()
    assert(mam(0).getDouble(1) == 1.0 && mam(0).getDouble(2) == 2.0)
    assert(mam(1).getDouble(3) == 7.0)
    val gs = ReadSide.groupSum(df, col("k"), col("v")).collect()
    assert(gs(0).getString(0) == "b" && gs(0).getDouble(1) == 12.0)
    val dc = ReadSide.distinctCount(df, col("k"), col("user"))
      .orderBy("key").collect()
    assert(dc(0).getLong(1) == 2L && dc(1).getLong(1) == 1L)
  }
}

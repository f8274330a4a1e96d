package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic events → flows mapping.
  *
  * The driver's oracle testdata (TESTDATA.md) has no IP-flow table, so the
  * engine's Stream4Flow-semantics operators are exercised over a flow view
  * synthesized 1:1 from the `events` table with engine-portable arithmetic:
  * the exact same mapping is defined twice — as Spark `Column` expressions
  * ([[flows]]) and as a DuckDB SQL CTE ([[cteSql]]) — so every flow query can
  * be hash-checked against the DuckDB oracle. `q_flows_synth` in SparkEntry
  * is the parity test for the mapping itself.
  *
  * Field semantics mirror the reference's input contract (SURVEY.md §1.1):
  * v4/v6 split exercises the coalesce pattern (ssh_auth_simple.py:139-150),
  * tcp_flags the SYN-scan bitmask (ports_scan.py:176-177), dns_flags the
  * response/rcode bit ops (dns_statistics.py:184-207).
  *
  * NOTE: [[Tables.events]] normalizes `ts` to epoch-NANOS LongType whatever
  * the parquet encoding (TIMESTAMP(NANOS) via nanosAsLong, or timestamp[us]
  * via unix_micros — both set up by [[Graft.tune]]'s confs), so
  * `ts div 1e6` below equals DuckDB's `epoch_ms(ts)` on every encoding.
  */
object FlowSynth {

  /** Read `events` at sfDir and synthesize the flow view. */
  def flows(spark: SparkSession, sfDir: String): DataFrame =
    fromEvents(Tables.events(spark, sfDir))

  /** Pure transform: events DataFrame → flows DataFrame.
    *
    * `cols` restricts WHICH flow columns are synthesized (default: all).
    * Catalyst prunes unused columns from execution anyway, so the subset
    * buys nothing at runtime — what it buys is DRIVER latency: the full
    * 17-column tree (nested whens, concats, typedLit arrays) is
    * re-walked by every analyzer/optimizer pass of every downstream
    * Dataset op, and on sub-second queries that plan work rivals the
    * execution itself (measured on q_pattern_finder: build+optimize
    * ~0.4-0.9 s of a ~1.2 s wall). One definition, filtered — a separate
    * narrow synth WOULD drift from the oracle CTE. */
  def fromEvents(events: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val eid = col("event_id")
    val uid = col("user_id")
    val et  = col("event_type")
    val s   = (c: Column) => c.cast("string")
    val isDns = et.isin("purchase", "signup")
    val isTcp = et.isin("click", "view")
    // Integral div (`div`), not Column./ (double) — exact ms/octet parity
    // with DuckDB's epoch_ms / `//` matters for the oracle hash.
    val startMs = expr("ts div 1000000")
    val packets = lit(1L) + (eid % 50)
    val suites = Seq("002f", "0035", "0033", "0039", "009c", "1301", "c02f", "cca8")

    val all = Seq(
      eid.as("flow_id"),
      when(et =!= "error",
        concat(lit("10.0."), s(uid % 250), lit("."), s(expr("(user_id div 250) % 250"))))
        .as("src_ip4"),
      when(et === "error", concat(lit("fd00::"), s(uid % 100))).as("src_ip6"),
      concat(lit("192.168."), s(eid % 50), lit("."), s(uid % 50)).as("dst_ip"),
      when(isTcp, 6).when(isDns, 17).otherwise(1).as("protocol"),
      (lit(1024L) + (eid % 60000)).as("src_port"),
      when(et === "click", 22).when(et === "view", 80)
        .when(isDns, 53).otherwise(0).as("dst_port"),
      packets.as("packets"),
      (round(col("value") * 100, 0).cast("long") + lit(40L) * packets).as("bytes"),
      when(isTcp, eid % 32).otherwise(0L).as("tcp_flags"),
      startMs.as("start_ms"),
      (startMs + (eid % 5000)).as("end_ms"),
      when(et === "click",
        concat(lit("www.site"), s(eid % 20), lit(".org"))).as("http_host"),
      when(isDns,
        concat(lit("host"), s(eid % 40), lit(".zone"), s(uid % 5), lit(".example")))
        .as("dns_name"),
      when(isDns,
        when(eid % 4 === 0, 1).when(eid % 4 === 1, 28)
          .when(eid % 4 === 2, 5).otherwise(15)).as("dns_qtype"),
      when(isDns,
        when(eid % 2 === 1, 256L)
          .otherwise(lit(33152L) +
            when(eid % 3 === 0, 0L).when(eid % 3 === 1, 3L).otherwise(5L)))
        .as("dns_flags"),
      when(isDns && eid % 2 === 0,
        when(eid % 5 === 0, 1).when(eid % 5 === 1, 2)
          .when(eid % 5 === 2, 5).when(eid % 5 === 3, 28).otherwise(16))
        .as("dns_crr_type"),
      when(isDns && eid % 2 === 0,
        concat(lit("0x"), lpad(lower(hex(eid % 4294967296L)), 8, "0")))
        .as("dns_rdata"),
      when(et === "view",
        concat(lit("0x"),
          element_at(typedLit(suites), (eid % 8 + 1).cast("int")),
          element_at(typedLit(suites), (uid % 8 + 1).cast("int"))))
        .as("tls_cipher_suites")
    )
    val picked =
      if (cols.isEmpty) all
      else {
        val byName = all.map(c => exprName(c) -> c).toMap
        cols.map(n => byName.getOrElse(n,
          throw new IllegalArgumentException(s"unknown flow column $n")))
      }
    events.select(picked: _*)
  }

  private def exprName(c: Column): String =
    org.apache.spark.sql.graftbridge.ColumnBridge.aliasName(c)
      .getOrElse(c.toString)

  /** The flow columns the biflow/pattern-finder path consumes — the
    * narrow [[fromEvents]] subset for callers on that path. */
  val biflowCols: Seq[String] = Seq("flow_id", "src_ip4", "dst_ip",
    "src_port", "dst_port", "packets", "bytes", "start_ms", "end_ms")

  /** The identical mapping as a DuckDB CTE body (oracle side). Compose
    * oracles as: WITH flows AS (<cteSql>) SELECT ... */
  val cteSql: String = """
    SELECT
      event_id AS flow_id,
      CASE WHEN event_type <> 'error' THEN
        '10.0.' || CAST(user_id % 250 AS VARCHAR) || '.' || CAST((user_id // 250) % 250 AS VARCHAR)
      END AS src_ip4,
      CASE WHEN event_type = 'error' THEN 'fd00::' || CAST(user_id % 100 AS VARCHAR) END AS src_ip6,
      '192.168.' || CAST(event_id % 50 AS VARCHAR) || '.' || CAST(user_id % 50 AS VARCHAR) AS dst_ip,
      CASE WHEN event_type IN ('click','view') THEN 6
           WHEN event_type IN ('purchase','signup') THEN 17 ELSE 1 END AS protocol,
      1024 + (event_id % 60000) AS src_port,
      CASE event_type WHEN 'click' THEN 22 WHEN 'view' THEN 80
           WHEN 'purchase' THEN 53 WHEN 'signup' THEN 53 ELSE 0 END AS dst_port,
      1 + (event_id % 50) AS packets,
      CAST(round(value * 100, 0) AS BIGINT) + 40 * (1 + (event_id % 50)) AS bytes,
      CASE WHEN event_type IN ('click','view') THEN event_id % 32 ELSE 0 END AS tcp_flags,
      epoch_ms(ts) AS start_ms,
      epoch_ms(ts) + (event_id % 5000) AS end_ms,
      CASE WHEN event_type = 'click' THEN 'www.site' || CAST(event_id % 20 AS VARCHAR) || '.org' END AS http_host,
      CASE WHEN event_type IN ('purchase','signup') THEN
        'host' || CAST(event_id % 40 AS VARCHAR) || '.zone' || CAST(user_id % 5 AS VARCHAR) || '.example'
      END AS dns_name,
      CASE WHEN event_type IN ('purchase','signup') THEN
        CASE event_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 28 WHEN 2 THEN 5 ELSE 15 END
      END AS dns_qtype,
      CASE WHEN event_type IN ('purchase','signup') THEN
        CASE WHEN event_id % 2 = 1 THEN 256
             ELSE 33152 + (CASE event_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 3 ELSE 5 END) END
      END AS dns_flags,
      CASE WHEN event_type IN ('purchase','signup') AND event_id % 2 = 0 THEN
        CASE event_id % 5 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 5 WHEN 3 THEN 28 ELSE 16 END
      END AS dns_crr_type,
      CASE WHEN event_type IN ('purchase','signup') AND event_id % 2 = 0 THEN
        '0x' || lpad(lower(to_hex(event_id % 4294967296)), 8, '0')
      END AS dns_rdata,
      CASE WHEN event_type = 'view' THEN
        '0x' || (['002f','0035','0033','0039','009c','1301','c02f','cca8'])[CAST(event_id % 8 + 1 AS INT)]
             || (['002f','0035','0033','0039','009c','1301','c02f','cca8'])[CAST(user_id % 8 + 1 AS INT)]
      END AS tls_cipher_suites
    FROM events
  """.trim

  /** Wrap an oracle query body with the flows CTE; a body that itself
    * starts with WITH gets merged into a single CTE list. */
  def oracle(body: String): String = {
    val b = body.trim
    if (b.toUpperCase.startsWith("WITH "))
      s"WITH flows AS ($cteSql),\n${b.drop(5)}"
    else s"WITH flows AS ($cteSql)\n$b"
  }
}

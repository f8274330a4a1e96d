package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.FlowSchema

/** Streaming flow sources: Kafka (production), file (replay), or any
  * user-supplied raw stream of JSON lines.
  *
  * Reference: applications/application_template/modules/kafkaIO.py:41-63 —
  * receiver-based DStream + driver json.loads. Spark-first: the Kafka
  * source's parallelism is the topic's partition count (the reference was
  * pinned to 1 partition/1 receiver — kafka-server.properties.j2:61);
  * JSON parse is a codegen'd from_json against a fixed schema, not
  * per-record Python.
  */
object FlowSource {

  /** Deterministic flow id from Kafka source metadata: partition << 48 |
    * offset — stable across replays and failure re-execution (unlike
    * monotonically_increasing_id, whose per-partition counters restart
    * every microbatch and which streaming analysis rejects outright).
    *
    * Offsets ≥ 2^48 (~2.8e14 records in one partition) or partitions
    * ≥ 2^15 would alias ids across partitions; both FAIL LOUDLY via
    * raise_error instead of silently colliding — at 100 TB-scale
    * long-retention topics an overflow must stop the query, not corrupt
    * biflow pairing. */
  def kafkaFlowId: Column = {
    val guarded = when(
      col("offset") >= (1L << 48) || col("partition").cast("long") >= (1L << 15),
      raise_error(concat(lit("kafkaFlowId overflow: partition="),
        col("partition"), lit(" offset="), col("offset"))))
    coalesce(guarded,
      shiftleft(col("partition").cast("long"), 48).bitwiseOR(col("offset")))
  }

  /** Pick a flow-id derivation from whatever metadata the raw frame has.
    * Kafka frames carry (partition, offset) → [[kafkaFlowId]]. File-replay
    * frames carry `_src_file` (see [[files]]) → xxhash64(file, line):
    * stable across restarts; collides only for byte-identical lines
    * within one file. A bare streaming `value` frame (e.g. a socket or
    * MemoryStream) falls back to xxhash64(value) — per-content, so
    * duplicate payloads share an id; analytics needing per-record ids
    * should feed a metadata-bearing source. Batch frames keep
    * monotonically_increasing_id (one-shot, no replay concern), which
    * also guarantees distinct ids for identical payloads.
    *
    * WARNING (file replay): the text source exposes no per-line offset,
    * so two byte-identical lines in ONE file silently share an id —
    * unlike Kafka (offset-derived) and batch (counter-derived) ids, which
    * are distinct for identical payloads. Analytics that need ids to tell
    * identical records apart (biflow pairing J5) must replay through a
    * metadata-bearing source (Kafka, or pre-deduplicated files); flow
    * replay files produced by `graft` tooling embed distinct timestamps,
    * which keeps lines distinct in practice. */
  private def defaultFlowId(raw: DataFrame): Column =
    if (!raw.isStreaming) monotonically_increasing_id()
    else if (raw.columns.contains("partition") && raw.columns.contains("offset"))
      kafkaFlowId
    else if (raw.columns.contains("_src_file"))
      xxhash64(col("_src_file"), col("value"))
    else xxhash64(col("value"))

  /** Parse a DataFrame with a string `value` column of wire-format JSON
    * (`ipfix.*` keys) into engine flow columns + `event_time`.
    *
    * Besides the raw wire fields this emits the derived columns every
    * analytic consumes: `src_ip`/`dst_ip` (v4-with-v6-fallback — the
    * reference's get_ip pattern, ssh_auth_simple.py:139-150) and a
    * surrogate `flow_id` (the wire format has no record id; analytics
    * like biflow pairing need one to tell two otherwise-identical flow
    * records apart). The id derivation is source-aware — see
    * [[parseWithId]] for supplying your own. */
  def parse(raw: DataFrame): DataFrame = parseWithId(raw, defaultFlowId(raw))

  /** [[parse]] with an explicit flow-id expression, evaluated against the
    * RAW frame (so Kafka partition/offset or file metadata columns are
    * still in scope) before projection down to flow columns. */
  def parseWithId(raw: DataFrame, flowId: Column): DataFrame = {
    val parsed = raw.select(
      from_json(col("value").cast("string"), FlowSchema.wireSchema).as("j"),
      flowId.cast("long").as("flow_id"))
    val cols = FlowSchema.jsonFieldMap.map { case (wire, c) =>
      parsed.col("j").getField(wire).as(c)
    }
    parsed.select(cols :+ parsed.col("flow_id"): _*)
      .withColumn("src_ip",
        coalesce(col(FlowSchema.F.srcIp4), col(FlowSchema.F.srcIp6)))
      .withColumn("dst_ip",
        coalesce(col(FlowSchema.F.dstIp4), col(FlowSchema.F.dstIp6)))
      .withColumn("event_time", timestamp_millis(col(FlowSchema.F.startMs)))
  }

  /** Kafka topic → flow stream (reference S1+S2). */
  def kafka(spark: SparkSession, bootstrap: String, topic: String,
            startingOffsets: String = "latest"): DataFrame =
    parse(spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load())

  /** Directory of JSON-lines files → flow stream (replay/testing).
    * Carries the source file path so flow ids stay stable across replays
    * (xxhash64 of file + line, not a restart-unstable counter). */
  def files(spark: SparkSession, path: String,
            maxFilesPerTrigger: Int = 16): DataFrame =
    parse(spark.readStream.format("text")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)
      .select(col("value"), col("_metadata.file_path").as("_src_file")))

  /** Attach event_time to an already-parsed flow DataFrame (e.g. from
    * MemoryStream[Flow] in tests or a batch frame for parity runs). */
  def withEventTime(flows: DataFrame): DataFrame =
    flows.withColumn("event_time", timestamp_millis(col(FlowSchema.F.startMs)))
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Parse a DataFrame with a string `value` column of wire-format JSON
    * (`ipfix.*` keys) into engine flow columns + `event_time`.
    *
    * Besides the raw wire fields this emits the derived columns every
    * analytic consumes: `src_ip`/`dst_ip` (v4-with-v6-fallback — the
    * reference's get_ip pattern, ssh_auth_simple.py:139-150) and a
    * surrogate `flow_id` (the wire format has no record id; analytics
    * like biflow pairing need one to tell two otherwise-identical flow
    * records apart). */
  def parse(raw: DataFrame): DataFrame = {
    val parsed = raw.select(
      from_json(col("value").cast("string"), FlowSchema.wireSchema).as("j"))
    val cols = FlowSchema.jsonFieldMap.map { case (wire, c) =>
      parsed.col("j").getField(wire).as(c)
    }
    parsed.select(cols: _*)
      .withColumn("src_ip",
        coalesce(col(FlowSchema.F.srcIp4), col(FlowSchema.F.srcIp6)))
      .withColumn("dst_ip",
        coalesce(col(FlowSchema.F.dstIp4), col(FlowSchema.F.dstIp6)))
      .withColumn("flow_id", monotonically_increasing_id())
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

  /** Directory of JSON-lines files → flow stream (replay/testing). */
  def files(spark: SparkSession, path: String,
            maxFilesPerTrigger: Int = 16): DataFrame =
    parse(spark.readStream.format("text")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)
      .withColumnRenamed("value", "value"))

  /** Attach event_time to an already-parsed flow DataFrame (e.g. from
    * MemoryStream[Flow] in tests or a batch frame for parity runs). */
  def withEventTime(flows: DataFrame): DataFrame =
    flows.withColumn("event_time", timestamp_millis(col(FlowSchema.F.startMs)))
}

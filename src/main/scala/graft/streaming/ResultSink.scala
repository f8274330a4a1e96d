package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Result sinks (SURVEY.md §2.1 S3/S9).
  *
  * Reference: kafkaIO.py:66-112 — every windowed result collected to the
  * driver and sent via a single KafkaProducer (the scalability cliff called
  * out in SURVEY §3.1). Spark-first: distributed sinks — the Kafka sink
  * serializes per partition; the parquet sink replaces the ES daily index
  * with date-partitioned files (partition pruning ≙ index selection).
  */
object ResultSink {

  /** Tag rows like the reference's typed result documents (`@type`). */
  def tagged(df: DataFrame, atType: String): DataFrame =
    df.withColumn("type", lit(atType))
      .withColumn("timestamp", current_timestamp())

  /** results → Kafka topic as JSON lines (distributed, no driver collect). */
  def kafka(df: DataFrame, bootstrap: String, topic: String,
            checkpoint: String): DataStreamWriter[Row] =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** results → date-partitioned parquet (the ES `spark-YYYY.MM.dd` index
    * analog; daily partitions prune on the read side). */
  def parquet(df: DataFrame, path: String, checkpoint: String,
              dateCol: String = "timestamp"): DataStreamWriter[Row] =
    df.withColumn("date", to_date(col(dateCol)))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("date")

  /** Micro-batch bridge for custom handling — the disciplined foreachRDD
    * replacement (work stays distributed inside the batch function). */
  def foreachBatch(df: DataFrame, trigger: Trigger = Trigger.ProcessingTime("5 seconds"))(
      f: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream.trigger(trigger).foreachBatch(f)

  /** Idempotent micro-batch parquet write: `foreachBatch` replays the
    * LAST batch after a restart (its at-least-once contract), so a naive
    * append sink duplicates it. Each batch lands in its own
    * `batch_id=<id>` partition directory with overwrite semantics and a
    * commit marker: a replayed id finds its marker and is skipped; a
    * half-written batch (no marker) is overwritten whole.
    *
    * Read-side contract: [[readCommitted]] sees exactly-once data on
    * EVERY read — it lists only marker-committed batch dirs. A bare
    * `spark.read.parquet(path)` is exactly-once only eventually: after
    * a crash that wrote data but no marker, it sees the torn batch (and
    * mid-overwrite state during the retry) until the replay rewrites
    * it. Works on any filesystem with atomic file create — no table
    * format required. */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long,
                           path: String): Boolean = {
    val spark = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(s"$path/batch_id=$batchId")
    val marker = new org.apache.hadoop.fs.Path(
      s"$path/_committed_$batchId")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) false // replay of a committed batch: skip
    else {
      batch.write.mode("overwrite").parquet(dir.toString)
      fs.create(marker, false).close()
      true
    }
  }

  /** Exactly-once read of a [[writeBatchIdempotent]] store: only batch
    * directories with a `_committed_<id>` marker are listed, so a torn
    * batch (data written, crash before its marker) and mid-overwrite
    * replay state are invisible — every read sees committed batches
    * only, not just reads that happen after recovery. The explicit dir
    * list IS the pruning (uncommitted dirs are never even scanned);
    * `batch_id` stays a partition column via basePath. Empty store →
    * empty frame. */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root).map(_.getPath.getName)
        .collect { case n if n.startsWith("_committed_") =>
          s"$path/batch_id=${n.stripPrefix("_committed_")}" }
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.option("basePath", path).parquet(dirs.toIndexedSeq: _*)
  }

  /** Streaming face of [[writeBatchIdempotent]]: exactly-once parquet via
    * foreachBatch + per-batch commit markers. */
  def parquetIdempotent(df: DataFrame, path: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): DataStreamWriter[Row] =
    foreachBatch(df, trigger)((b, id) => { writeBatchIdempotent(b, id, path); () })
}

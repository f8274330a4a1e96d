package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly detection over a keyed metric time series:
  * bucket the stream, then flag buckets whose value deviates from the
  * trailing-window mean by more than `zThreshold` standard deviations.
  * Generalizes the reference's fixed-threshold detections (e.g. the DDoS
  * short-vs-long horizon compare, `ddos.py` W3) into the adaptive
  * baseline a dashboard operator actually wants: the threshold scales
  * with each key's own variance, so chatty and quiet series share one
  * config.
  *
  * Scale shape: one hash aggregate to (key, bucket) — map-side partial,
  * output cardinality |keys|·|buckets|, tiny relative to the input — then
  * a per-key window over that REDUCED series. The window sort is over
  * buckets, not events; no state beyond `lookback` rows per key. The
  * trailing frame excludes the current bucket (a spike must not inflate
  * its own baseline) and is ROW-based: for sparse keys the baseline is
  * the last `lookback` OBSERVED buckets, however far back they reach.
  *
  * Determinism: bucket sums are rounded before the window (double
  * summation order noise collapses), and both the output z and the
  * threshold test use the same 4-dp rounding — no boundary flicker
  * between engines.
  *
  * @param key        series key columns (e.g. event_type, protocol)
  * @param tsMs       epoch-millis column
  * @param valueCol   metric to sum per bucket
  * @param bucketMs   bucket width in ms
  * @param lookback   trailing buckets forming the baseline
  * @param minPoints  minimum observed baseline buckets to judge at all
  * @param zThreshold flag when `abs(z) >= zThreshold`
  */
object TimeSeriesAnomaly {

  def apply(rows: DataFrame, key: Seq[String], tsMs: String, valueCol: String,
            bucketMs: Long, lookback: Int = 24, minPoints: Int = 12,
            zThreshold: Double = 2.0): DataFrame = {
    require(lookback >= minPoints && minPoints > 0, "need minPoints <= lookback")
    val keyCols = key.map(col)
    val series = rows
      .withColumn("bucket_ms",
        (col(tsMs).cast("long") / bucketMs).cast("long") * bucketMs)
      .groupBy(keyCols :+ col("bucket_ms"): _*)
      .agg(round(sum(valueCol), 2).as("value"))
    val w = Window.partitionBy(keyCols: _*).orderBy("bucket_ms")
      .rowsBetween(-lookback, -1)
    series
      .withColumn("mean", avg("value").over(w))
      .withColumn("sd", stddev_samp("value").over(w))
      .withColumn("n_prev", count("value").over(w))
      .filter(col("n_prev") >= minPoints && col("sd") > 0)
      .withColumn("z", round((col("value") - col("mean")) / col("sd"), 4))
      .filter(abs(col("z")) >= zThreshold)
      .select(keyCols ++ Seq(col("bucket_ms"), col("value"),
        round(col("mean"), 6).as("mean"), round(col("sd"), 6).as("sd"),
        col("z")): _*)
  }
}

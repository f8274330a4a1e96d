package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.SketchExpressions

/** Mergeable quantile sketches — the third member of the sketch-layer
  * family ([[Sketches]] distincts, [[FreqSketches]] frequencies):
  * per-bucket Greenwald–Khanna summaries built once, persisted as a
  * binary column with a stable explicit codec
  * ([[graft.expressions.QuantileCodec]], not Java serialization), and
  * any coarser percentile question — p99 latency over an arbitrary day
  * range, per key, or globally — answered by merging summaries.
  *
  * Spark's own `percentile_approx` uses the same GK structure but its
  * result column is the final VALUE: the sketch state is plan-internal,
  * so every new grouping pays a full rescan. This layer persists the
  * state itself. Rank error is ≤ relativeError·n per sketch and
  * degrades additively across merges — size `relativeError` for the
  * post-rollup bound you need. */
object QuantileSketches {

  /** The persisted layer: one row per fine bucket with a GK summary of
    * `x` (cast to double upstream if needed). */
  def buildLayer(df: DataFrame, keys: Seq[Column], x: Column,
                 relativeError: Double = 0.01): DataFrame =
    df.groupBy(keys: _*)
      .agg(SketchExpressions.quantileSketch(x, relativeError).as("sketch"))

  /** Merge a layer's summaries up to coarser keys, kept as sketches. */
  def rollupSketches(layer: DataFrame, keys: Seq[Column]): DataFrame =
    layer.groupBy(keys: _*)
      .agg(SketchExpressions.quantileSketchMerge(col("sketch")).as("sketch"))

  /** ε-approximate quantile column (an actual data value whose rank is
    * within ε·n of the target). */
  def query(sketch: Column, q: Double): Column =
    SketchExpressions.quantileSketchQuery(sketch, lit(q))

  /** Attach a set of percentile columns to a sketch frame. */
  def percentiles(layer: DataFrame, qs: Seq[Double]): DataFrame =
    qs.foldLeft(layer) { (df, q) =>
      df.withColumn(s"p${(q * 100).round}", query(col("sketch"), q))
    }.drop("sketch")

  // ----- incremental store (same LSM discipline as Sketches) ------------

  /** Append one batch's fine-bucket summaries. Like [[FreqSketches]],
    * GK merge ADDS mass — a replayed batch double-weights its values;
    * pair with committed-batch reads under at-least-once delivery. */
  def ingest(dir: String, batch: DataFrame, keys: Seq[Column], x: Column,
             relativeError: Double = 0.01): Unit =
    buildLayer(batch, keys, x, relativeError)
      .write.mode("append").parquet(dir)

  /** Current layer view: delta summaries merged per fine bucket. */
  def readLayer(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(dir)
    val keyCols = raw.schema.fieldNames.filter(_ != "sketch").map(col)
    rollupSketches(raw, keyCols.toSeq)
  }

  /** Rewrite the store with one summary per bucket (rank-bound neutral;
    * crash-safe via [[Stores.rewriteAtomically]]). */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    Stores.rewriteAtomically(spark, dir, readLayer(spark, dir))
}

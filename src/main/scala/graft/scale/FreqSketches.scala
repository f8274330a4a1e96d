package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.SketchExpressions

/** Mergeable frequency sketches — the count-min sibling of
  * [[Sketches]]: build per-bucket CMS sketches once (Spark's native
  * `count_min_sketch` aggregate), persist the binary column, answer
  * point-frequency and heavy-hitter questions over any coarser grouping
  * by merging sketches ([[graft.expressions.CmsMergeAgg]]) — never by
  * rescanning raw rows.
  *
  * CMS merge is exact counter addition, so unlike HLL the rolled-up
  * sketch is BIT-IDENTICAL to one built directly over the union (same
  * depth/width/seed — mixed geometries throw). Estimates carry one-sided
  * error: `est ≥ true`, `est ≤ true + ε·N` with probability
  * `confidence`, N = total additions. Candidate heavy-hitter keys still
  * need a source (sketches can't enumerate keys); the standard pattern
  * pairs the sketch layer with cheap per-bucket exact top-N candidates
  * and lets the merged sketch score them globally — [[heavyHitters]].
  */
object FreqSketches {

  /** The persisted layer: one row per fine bucket with a serialized CMS
    * of `counted`. `eps`/`confidence` size the sketch
    * (width = ceil(2/eps), depth = ceil(ln(1/(1-confidence)))); `seed`
    * must match across every layer that will ever merge. */
  def buildLayer(df: DataFrame, keys: Seq[Column], counted: Column,
                 eps: Double = 0.001, confidence: Double = 0.99,
                 seed: Int = 1): DataFrame =
    df.groupBy(keys: _*)
      .agg(count_min_sketch(counted, lit(eps), lit(confidence), lit(seed))
        .as("sketch"))

  /** Merge a layer's sketches up to coarser keys, kept as sketches. */
  def rollupSketches(layer: DataFrame, keys: Seq[Column]): DataFrame =
    layer.groupBy(keys: _*)
      .agg(SketchExpressions.cmsMerge(col("sketch")).as("sketch"))

  /** Point-frequency estimate column. */
  def estimate(sketch: Column, item: Column): Column =
    SketchExpressions.cmsEstimate(sketch, item)

  /** Heavy hitters over a rolled-up layer: per-bucket exact top-`perBucket`
    * keys seed the candidate set (map-side-combinable count + partitioned
    * top-N — a global heavy hitter is necessarily heavy in ≥1 bucket when
    * buckets partition the rows), then the merged sketch scores every
    * candidate globally and the global top-`k` is kept. `df` is the raw
    * frame only for candidate seeding; the global counting never rescans
    * it. */
  def heavyHitters(layer: DataFrame, df: DataFrame, keys: Seq[Column],
                   counted: Column, k: Int, perBucket: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // alias bucket keys internally: expression keys (e.g. `ts div X`)
    // can't be re-referenced by the window after the aggregate
    val keyed = keys.zipWithIndex.map { case (k, i) => k.as(s"__k$i") }
    val keyRefs = keys.indices.map(i => col(s"__k$i"))
    val byBucket = df.groupBy(keyed :+ counted.as("item"): _*)
      .agg(count(lit(1)).as("bucket_count"))
    val candidates = byBucket
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyRefs: _*)
          .orderBy(col("bucket_count").desc, col("item").asc)))
      .filter(col("__rn") <= perBucket)
      .select("item").distinct()
    val merged = rollupSketches(layer, Seq(lit(1).as("__g"))).drop("__g")
    candidates.crossJoin(broadcast(merged))
      .select(col("item"), estimate(col("sketch"), col("item")).as("est_count"))
      .orderBy(col("est_count").desc, col("item").asc)
      .limit(k)
  }

  // ----- incremental store (same LSM discipline as Sketches) ------------

  /** Append one batch's fine-bucket sketches. NOTE: unlike HLL, CMS
    * merge ADDS counters — a replayed batch double-counts. Pair with an
    * idempotent upstream (e.g. [[graft.streaming.ResultSink]]'s
    * committed-batch reads) when delivery is at-least-once. */
  def ingest(dir: String, batch: DataFrame, keys: Seq[Column],
             counted: Column, eps: Double = 0.001,
             confidence: Double = 0.99, seed: Int = 1): Unit =
    buildLayer(batch, keys, counted, eps, confidence, seed)
      .write.mode("append").parquet(dir)

  /** Current layer view: delta sketches merged per fine bucket. */
  def readLayer(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(dir)
    val keyCols = raw.schema.fieldNames.filter(_ != "sketch").map(col)
    rollupSketches(raw, keyCols.toSeq)
  }

  /** Rewrite the store with one sketch per bucket (value-neutral;
    * crash-safe via [[Stores.rewriteAtomically]]). */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    Stores.rewriteAtomically(spark, dir, readLayer(spark, dir))
}

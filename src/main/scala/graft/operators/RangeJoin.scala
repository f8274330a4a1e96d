package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap (range) join: pairs of rows whose [start, end]
  * intervals intersect, `leftStart <= rightEnd AND rightStart <= leftEnd`.
  * Spark plans a raw inequality join as BroadcastNestedLoopJoin (O(N·M)
  * with a broadcast side) — unusable when both sides are large; this is
  * the bucketed equi-join form that engines with native range joins
  * (DuckDB IEJoin, Databricks range join hints) implement internally.
  *
  * Each interval explodes into the coarse buckets of width `bucketWidth`
  * it touches; candidates meet through a plain equi-join on the bucket
  * (plus any `key` columns), so the only shuffle is hash-partitioned by
  * (key, bucket) — time-local, AQE-coalescible, never a cross join.
  *
  * A pair whose intervals share k buckets would surface k times; instead
  * of a distinct (a second full shuffle of the pair stream) each pair is
  * ATTRIBUTED to exactly one bucket — the bucket containing the overlap
  * start `greatest(leftStart, rightStart)`, which both sides share by
  * construction — and other buckets drop it with a cheap filter. Output
  * is exact: bucketing only generates candidates, the precise interval
  * predicate is applied after the join.
  *
  * Scale tuning: `bucketWidth` ≈ a typical interval length. Too wide →
  * many intervals per bucket (quadratic within the bucket); too narrow →
  * long intervals explode into many buckets (row blowup linear in
  * interval/width). Heavily skewed interval lengths: cap the explode by
  * pre-splitting giants upstream, or salt hot buckets via
  * [[graft.scale.Skew]].
  *
  * Column names of `left` and `right` must be disjoint; output is
  * left.* ++ right.*.
  */
object RangeJoin {

  def overlap(left: DataFrame, right: DataFrame,
              leftStart: String, leftEnd: String,
              rightStart: String, rightEnd: String,
              bucketWidth: Long, key: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(s: String, e: String) =
      explode(sequence(floor(col(s) / bucketWidth).cast("long"),
        floor(col(e) / bucketWidth).cast("long"))).as("__bucket")
    val l = left.select(col("*"), buckets(leftStart, leftEnd))
    val r = right.select(col("*"), buckets(rightStart, rightEnd))
    val joinKeys = key :+ "__bucket"
    l.join(r, joinKeys)
      // exact predicate + one-bucket attribution (overlap-start bucket)
      .filter(col(leftStart) <= col(rightEnd) &&
        col(rightStart) <= col(leftEnd) &&
        col("__bucket") ===
          floor(greatest(col(leftStart), col(rightStart)) / bucketWidth)
            .cast("long"))
      .drop("__bucket")
  }
}

package graft.scale

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global row ids at corpus scale.
  *
  * The naive spelling — `row_number().over(Window.orderBy(...))` — is a
  * window with an empty partition spec: Spark moves EVERY row through one
  * task (it even logs the "moving all data to a single partition"
  * warning), which is the first thing to die at 100 TB. The distributed
  * form splits the order into contiguous key ranges, ranks WITHIN each
  * range (a partitioned window — parallel), and adds per-range start
  * offsets computed from range COUNTS — a numRanges-long array on the
  * driver, metadata-sized, never the data.
  *
  * The ranges are NOT `repartitionByRange`'s: Spark's RangePartitioner
  * samples its boundaries with an RDD-instance-derived seed, so two
  * actions over the same frame can see DIFFERENT boundaries — counts
  * collected in one job would misalign with ranks computed in the next
  * (`RDD.zipWithIndex` only dodges this by running both jobs over one
  * pinned RDD instance, at the price of leaving Tungsten). Here the
  * boundaries are data-deterministic — quantiles of the rows whose key
  * xxhash64 falls in a 1/s slice, a fixed-size order-independent sample
  * — so every job derives identical buckets by construction, and the
  * whole pipeline stays in codegen with lineage intact for AQE.
  *
  * Training pipelines need this for stable example numbering (shard
  * assignment, resumable epoch order) after every shuffle-heavy curation
  * stage has scrambled row order.
  */
object Ids {

  /** Driver-side candidate ordering: field-wise Comparable compare,
    * nulls first. Only bucket BALANCE depends on this matching Spark's
    * ordering exactly; bucket membership (and therefore id correctness)
    * is monotone in the engine's own `>=` — see [[assign]]. */
  private val rowOrd: Ordering[Row] = (a: Row, b: Row) => {
    var i = 0
    var c = 0
    while (i < a.length && c == 0) {
      c = (a.get(i), b.get(i)) match {
        case (null, null) => 0
        case (null, _)    => -1
        case (_, null)    => 1
        case (x: Comparable[_], y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
        case _ => 0
      }
      i += 1
    }
    c
  }

  /** `df` plus `idCol` = 0..N-1 assigned in ascending `order` — exactly
    * `row_number() OVER (ORDER BY order) - 1` (the q_assign_ids oracle
    * runs precisely that SQL), without the single-partition window and
    * without leaving Tungsten. The special case of [[prefixSum]] with
    * unit weights: the exclusive running count of earlier rows IS the
    * 0-based rank. */
  def assign(df: DataFrame, order: Seq[String],
             idCol: String = "row_id", partitions: Int = 0): DataFrame =
    prefixSum(df, order, lit(1L), idCol, partitions)

  /** `df` plus `outCol` = the EXCLUSIVE running sum of `weight` in
    * ascending `order` — exactly `coalesce(sum(weight) OVER (ORDER BY
    * order ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)` —
    * without the single-partition window that spelling costs (Spark
    * funnels EVERY row through one task for an empty partition spec;
    * first thing to die at 100 TB). The workhorse behind contiguous id
    * assignment ([[assign]]) and sequence packing
    * (Curation.packSequences), and generally any "where does my row
    * start in the global order" question.
    *
    * `order` must be a UNIQUE key (include a tiebreaker column if not):
    * ties straddling a range boundary would get nondeterministic sums.
    * `weight` must be integral and non-negative.
    *
    * Three metadata-sized passes: (1) count, (2) boundary candidates —
    * every row whose key hash lands in a 1/s slice, s sized so ~64·n
    * rows reach the driver regardless of corpus size, (3) per-bucket
    * weight totals → driver prefix-sum offsets. Then one shuffle on the
    * bucket column runs the running sum WITHIN each range in parallel
    * and a literal-array lookup adds the range's start offset. The
    * ranges are NOT `repartitionByRange`'s (see the object doc: those
    * boundaries are instance-seeded, so separate actions would
    * misalign); they are data-deterministic, so every pass derives
    * identical buckets by construction. Correctness never depends on
    * the boundary sample quality: `bucket(r) = #{b : key(r) >= b}` is
    * monotone in the engine's struct ordering — the same ordering the
    * window's ORDER BY uses — so concatenating buckets in bucket order
    * IS the global order; a skewed sample only skews bucket sizes. */
  def prefixSum(df: DataFrame, order: Seq[String], weight: Column,
                outCol: String, partitions: Int = 0): DataFrame =
    prefixSumWithTotal(df, order, weight, outCol, partitions)._1

  /** [[prefixSum]] plus the corpus-wide weight total — free for callers
    * that need it (token-balanced sharding divides by it): the driver
    * already holds every bucket total to build the offsets, so the grand
    * total costs no extra job, where a separate `agg(sum)` would re-scan
    * (and for token weights re-tokenize) the whole corpus. */
  def prefixSumWithTotal(df: DataFrame, order: Seq[String], weight: Column,
                         outCol: String, partitions: Int = 0): (DataFrame, Long) = {
    require(order.nonEmpty, "Ids.prefixSum needs at least one order column")
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val cols = order.map(col)
    val key = struct(cols: _*)

    val total = df.count()
    val bounds: Seq[Row] =
      if (total == 0L) Seq.empty
      else {
        val s = math.max(1L, total / (n.toLong * 64L))
        val cands = df
          .filter(pmod(xxhash64(cols: _*), lit(s)) === 0)
          .select(cols: _*).collect().sorted(rowOrd)
        if (cands.isEmpty) Seq.empty
        else (1 until n)
          .map(i => cands(((i.toLong * cands.length) / n).toInt))
          .distinct
      }
    def boundLit(r: Row): Column = struct(r.toSeq.map(lit): _*)
    val bucketExpr =
      if (bounds.isEmpty) lit(0)
      else bounds.map(b => when(key >= boundLit(b), 1).otherwise(0))
        .reduce(_ + _)
    val bucketed = df.withColumn("__graft_bucket", bucketExpr)
    val totals = bucketed.groupBy("__graft_bucket")
      .agg(coalesce(sum(weight.cast("long")), lit(0L)).as("t"))
      .as[(Int, Long)].collect().toMap
    val offsets = (0 to bounds.length).scanLeft(0L)((acc, b) =>
      acc + totals.getOrElse(b, 0L)).take(bounds.length + 1).toArray
    val win = Window.partitionBy("__graft_bucket").orderBy(cols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = bucketed
      .withColumn(outCol,
        element_at(lit(offsets), col("__graft_bucket") + 1) +
          coalesce(sum(weight.cast("long")).over(win), lit(0L)))
      .select(df.columns.map(col).toSeq :+ col(outCol): _*)
    (out, offsets.last + totals.getOrElse(bounds.length, 0L))
  }
}

package graft.scale

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Contiguous global row ids at corpus scale.
  *
  * The naive spelling — `row_number().over(Window.orderBy(...))` — is a
  * window with an empty partition spec: Spark moves EVERY row through one
  * task (it even logs the "moving all data to a single partition"
  * warning), which is the first thing to die at 100 TB. The distributed
  * form is the one `RDD.zipWithIndex` implements: cluster-wide range
  * partitioning (each partition owns a contiguous key range), a local
  * sort inside each partition, then per-partition id offsets computed
  * from partition COUNTS — a numPartitions-long array on the driver,
  * metadata-sized, never the data.
  *
  * Training pipelines need this for stable example numbering (shard
  * assignment, resumable epoch order) after every shuffle-heavy curation
  * stage has scrambled row order.
  */
object Ids {

  /** `df` plus `idCol` = 0..N-1 assigned in ascending `order` — exactly
    * `row_number() OVER (ORDER BY order) - 1` (the q_assign_ids oracle
    * runs precisely that SQL), without the single-partition window.
    *
    * `order` must be a UNIQUE key (include a tiebreaker column if not):
    * range boundaries may split equal keys across partitions, so ties
    * would get nondeterministic ids. One extra pass over the data (the
    * count job `zipWithIndex` runs) plus the range-exchange — both
    * corpus-linear, neither funneling rows through one task. */
  def assign(df: DataFrame, order: Seq[String],
             idCol: String = "row_id", partitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "Ids.assign needs at least one order column")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val cols = order.map(col)
    val sorted = df.repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rows, schema)
  }
}

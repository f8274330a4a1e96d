package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off mechanics probe for the fused CC fixpoint test:
  *   1. does `observe(...)` populate `queryExecution.observedMetrics`
  *      when the action is an eager `localCheckpoint` (not collect)?
  *   2. can the stale previous round's local-checkpoint RDD be
  *      unpersisted (via the LogicalRDD handle) without breaking later
  *      consumers of the NEW checkpoint?
  */
object ObserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. observe + eager localCheckpoint
    val base = spark.range(0, 1000).toDF("id")
      .withColumn("v", col("id") % 7)
    val observed = base.groupBy("v").count()
      .observe("m", count(lit(1)).as("n"), coalesce(sum("count"), lit(0L)).as("s"))
    val cp1 = observed.localCheckpoint(true)
    val m = observed.queryExecution.observedMetrics.get("m")
    println(s"[probe] observedMetrics after localCheckpoint: $m")
    assert(m.exists(r => r.getLong(0) == 7L && r.getLong(1) == 1000L),
      "observe metrics missing or wrong after eager localCheckpoint")

    // 2. unpersist stale checkpoint, keep using the new one
    def cpRdd(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.logical match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
        case other => println(s"[probe] logical is ${other.getClass}"); None
      }
    val cp2 = cp1.withColumn("c2", col("count") * 2).localCheckpoint(true)
    val stale = cpRdd(cp1)
    println(s"[probe] stale rdd handle: ${stale.map(_.id)}")
    stale.foreach(_.unpersist(true))
    val total = cp2.agg(sum("c2")).head().getLong(0)
    println(s"[probe] post-unpersist consume of new checkpoint: $total")
    assert(total == 2000L, "new checkpoint unusable after stale unpersist")
    println("[probe] OK")
    spark.stop()
  }
}

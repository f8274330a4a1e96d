package graft.tools

import org.apache.spark.sql.SparkSession

/** Splits a registered query's warm wall time into DRIVER-SIDE cost
  * (DataFrame construction + analysis + optimization + physical
  * planning) and EXECUTION (the count on the already-planned frame) —
  * the diagnosis step for floor-dominated bench rows: a floor that is
  * planning amortizes to nothing at 100 TB (plans don't grow with
  * data), but it IS the recorded per-query number at bench scale, so
  * it decides whether to attack the plan or the plan-BUILDING.
  *
  * Usage: PlanningProbe <query> [sfDir] [reps] */
object PlanningProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Graft.tune(spark)
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // cold: codegen + footer reads, unmeasured
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis→physical planning
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"rep $i: build=${(t1 - t0) / 1e6}%.0fms " +
        f"plan=${(t2 - t1) / 1e6}%.0fms exec=${(t3 - t2) / 1e6}%.0fms " +
        f"total=${(t3 - t0) / 1e6}%.0fms")
    }
    spark.stop()
  }
}

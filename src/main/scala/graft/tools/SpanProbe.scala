package graft.tools

import org.apache.spark.sql.SparkSession

/** Executed-plan probe for the span-dedup gram cache: does the
  * pre-partitioned persisted gram frame actually spare its consumers
  * (occurrence aggregate + victim join) their own full gram-stream
  * exchanges at RUNTIME under AQE? Static explain cannot answer — the
  * cached subtree plans as `AdaptiveSparkPlan isFinalPlan=false`, whose
  * partitioning consumers cannot see until it materializes. Prints the
  * executed plan's shuffle-exchange count and wall for
  * [[graft.pipeline.TextPipeline.removeDupSpans]] /
  * [[graft.pipeline.TextPipeline.dupSpans]]. */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Graft.tune(spark)
    println("canChangeCachedPlanOutputPartitioning=" + spark.conf.getOption(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"))
    val docs = graft.core.Tables.documents(spark, sfDir)
    def drive(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = mk
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val p = df.queryExecution.executedPlan.toString
      val n = "Exchange hashpartitioning".r.findAllIn(p).size
      println(f"[$label] wall=$wall%.3f shuffle_exchanges=$n")
      if (sys.env.contains("SPAN_PLAN")) println(p)
    }
    // warm
    graft.pipeline.TextPipeline.dupSpans(docs).count()
    drive("dupSpans")(graft.pipeline.TextPipeline.dupSpans(docs))
    drive("removeDupSpans")(graft.pipeline.TextPipeline.removeDupSpans(docs))
    spark.stop()
  }
}

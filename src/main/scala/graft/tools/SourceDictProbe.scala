package graft.tools

import org.apache.spark.sql.SparkSession

/** Evidence probe for [[graft.pipeline.Curation.sourceOverlap]]'s
  * second corpus pass: the source-dictionary collect is a
  * column-pruned scan (`ReadSchema: struct<source>`), not a data pass.
  * Prints the dictionary query's executed plan (scan node included)
  * and its warm wall next to the full query's wall, so the
  * keep-two-passes decision carries its measured cost
  * (plans/r20/source_dict_scan.txt). */
object SourceDictProbe {
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
    val docs = graft.core.Tables.documents(spark, sfDir)
    import org.apache.spark.sql.functions.col
    // warm (JIT + parquet footers) — the full operator, dictionary included
    graft.pipeline.Curation.sourceOverlap(docs).count()
    def med(rep: Int)(f: => Unit): Double = {
      val walls = (1 to rep).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      walls(rep / 2)
    }
    val dict = docs.select(col("source")).distinct()
    val tDict = med(5)(dict.collect())
    val tFull = med(3)(
      graft.pipeline.Curation.sourceOverlap(docs)
        .write.format("noop").mode("overwrite").save())
    println(f"[dict-collect] med=$tDict%.3f s (of full q_source_overlap $tFull%.3f s)")
    println(dict.queryExecution.executedPlan.toString)
    spark.stop()
  }
}

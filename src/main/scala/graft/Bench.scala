package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // driver contract: bench runs at local[32] unless overridden
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Graft.tune(spark)
    // JVM/codegen/parquet-footer warmup so the first timed query isn't
    // charged ~4s of one-time session cost
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .groupBy("l_returnflag").count().collect()
    val all = SparkEntry.queries
    // SPARK_GRAFT_QUERIES=a,b,c overrides the headline set (ad-hoc timing)
    val names = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(
        if (SparkEntry.benchQueries.nonEmpty) SparkEntry.benchQueries
        else all.keys.toSeq)
    // count() over a left join of an aggregate lets Catalyst eliminate
    // the join and skip the work being measured — force the computed
    // column for the queries with that shape
    val forced: Map[String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame] =
      Map("q_remove_dup_spans" -> (df => df.filter(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text_clean")) >= 0)))
    def run(name: String): Option[String] =
      try {
        forced.getOrElse(name, identity[org.apache.spark.sql.DataFrame] _)
          .apply(all(name)(spark, sfDir)).count(); None
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          Some(e.getClass.getSimpleName)
      }
    // Steady-state measurement: run every query once untimed first
    // (JIT/codegen warm — the 100 TB-relevant number, since per-query
    // JIT amortizes over hours there; cold-vs-warm swings on the heavy
    // tier are ±3×, swamping real deltas). SPARK_GRAFT_COLD=1 restores
    // the old single-pass timing. The JSON line carries which mode ran.
    val warm = !sys.env.get("SPARK_GRAFT_COLD").contains("1")
    if (warm) names.distinct.foreach { n =>
      run(n); spark.catalog.clearCache() // caches stay cold, JIT stays warm
    }
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val err = run(name)
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // a crashed query must not read as a fast success: its timing is -1
    // and it is listed under "errors"
    val qs = results.map { case (k, v, err) =>
      s"\"" + k + "\":" + (if (err.isEmpty) v else -1.0)
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, _, Some(e)) => s"\"$k:$e\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"warmup":$warm,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.nonEmpty)) sys.exit(1)
  }
}

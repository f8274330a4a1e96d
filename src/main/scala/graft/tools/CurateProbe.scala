package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for q_curate: times each prefix of the composed
  * pipeline in isolation (cache cleared between phases), so the delta
  * between consecutive rows is that phase's cost — the measurement
  * behind any curate-stage optimization claim. */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Graft.tune(spark)
    import graft.pipeline.{Curation, TextPipeline}
    val reps = sys.env.getOrElse("REPS", "3").toInt

    def docs = graft.core.Tables.documents(spark, sfDir)
    def bench = docs.filter(col("doc_id") % 50 === 0)
    val rates = Map("src0" -> 0L, "src1" -> 250000L, "src2" -> 500000L)

    def phase(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val walls = (1 to reps).map { _ =>
        spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"  [$label] med=${walls.sorted.apply(reps / 2)}%.3f " +
        f"min=${walls.min}%.3f (${walls.map(w => f"$w%.2f").mkString(",")})")
    }

    // mirrors Curation.curate EXACTLY per prefix, including the keptIds
    // persist (without it the repetition chain recomputes per consumer
    // and prefix costs read higher than the full pipeline)
    def keptIdsP() = Curation.repetitionStats(docs)
      .filter(col("dup_word_frac") <= 0.55).select("doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def prefix(stage: Int): org.apache.spark.sql.DataFrame = {
      val keptIds = keptIdsP()
      val kept = docs.join(keptIds, Seq("doc_id"))
      if (stage == 1) return keptIds
      val comp = Curation.clusterComponents(kept)
      if (stage == 2) return comp
      val survivors = comp.filter(col("doc_id") === col("component"))
        .select("doc_id")
      val deduped = kept.join(survivors, Seq("doc_id"))
      if (stage == 3) return deduped
      val clean = Curation.decontaminate(deduped, bench, 3)
      if (stage == 4) return clean
      Curation.chunk(Curation.sampleBySource(clean, rates), 64, 48)
    }

    // warm pass (JIT, parquet footers)
    Curation.curate(docs, bench, ratesPpm = rates).count()
    spark.catalog.clearCache()

    phase("1 repetition keptIds")(prefix(1))
    phase("2 + cc components")(prefix(2))
    phase("3 + survivors+rejoin")(prefix(3))
    phase("4 + decontaminate")(prefix(4))
    phase("5 + mix + chunk (full)")(prefix(5))
    spark.stop()
  }
}

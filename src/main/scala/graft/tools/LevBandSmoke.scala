package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.core.DocSynth
import graft.pipeline.TextPipeline

/** Banded-levenshtein win at PRODUCTION text lengths.
  *
  * The r16 banded-confirm adoption was measured on ~0.4 KB short-form
  * DocSynth texts (76× less confirm CPU at 5M docs); the claim "the win
  * scales as len/maxDist" was extrapolation. This smoke measures it:
  * synthesize a long-form corpus (~20 KB/doc via DocSynth's
  * wordsMin/wordsMax knob), run `editDistancePairs` end-to-end twice —
  * banded threshold confirm vs the full O(len²) matrix
  * (`bandedConfirm = false`, value-identical by construction) — over the
  * IDENTICAL blocking tier, and print per-variant wall plus the
  * per-stage exec/gc table so the confirm stage's executor-seconds are
  * directly comparable (the ShuffleBreakdown discipline).
  *
  * Usage: `runMain graft.tools.LevBandSmoke [nDocs] [wordsMin] [wordsMax]`
  * (defaults 500000, 2300, 2600 ≈ 20 KB/doc). One JSON line per variant:
  * `{"variant":..,"n_docs":..,"rows":..,"wall_sec":..,"exec_sec":..,
  * "gc_sec":..,"max_stage_exec_sec":..}` followed by the stage table on
  * stderr-style println rows.
  */
object LevBandSmoke {

  private final class StageMeter extends SparkListener {
    val stages = ArrayBuffer.empty[(Int, String, Double, Double, Int)]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val exec = si.taskMetrics.executorRunTime / 1e3
      val gc = si.taskMetrics.jvmGCTime / 1e3
      stages.synchronized {
        stages += ((si.stageId,
          si.rddInfos.map(_.name).distinct.mkString(","),
          exec, gc, si.numTasks))
      }
    }
    def settle(): Unit = { // bounded quiesce (ScaleSmoke's pattern)
      val deadline = System.nanoTime() + 30L * 1000000000L
      var last = stages.synchronized(stages.size)
      var quiet = 0
      while (quiet < 2 && System.nanoTime() <= deadline) {
        Thread.sleep(100)
        val now = stages.synchronized(stages.size)
        if (now == last) quiet += 1 else { quiet = 0; last = now }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(500000L)
    val wordsMin = args.drop(1).headOption.map(_.toInt).getOrElse(2300)
    val wordsMax = args.drop(2).headOption.map(_.toInt).getOrElse(2600)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Graft.tune(spark)
    val scratch = sys.env.getOrElse("SPARK_GRAFT_SMOKE_SCRATCH",
      s"/tmp/graft_levband_${System.getProperty("user.name", "u")}")
    val dir = s"$scratch/docs_long_$nDocs"
    DocSynth.documents(spark, nDocs, wordsMin = wordsMin,
      wordsMax = wordsMax).write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val avgChars = docs.selectExpr("avg(n_chars)").first().getDouble(0)
    println(f"""{"corpus":"long_form","n_docs":$nDocs,"avg_chars":$avgChars%.0f}""")

    // JIT/codegen warm on a small slice, both variants, untimed
    Seq(true, false).foreach { b =>
      TextPipeline.editDistancePairsCached(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") < 2000),
        maxDist = 10, n = 2, maxDf = 10L, bandedConfirm = b)
        .result.count()
      spark.catalog.clearCache()
    }

    Seq(("banded", true), ("full_matrix", false)).foreach { case (tag, b) =>
      spark.catalog.clearCache()
      System.gc()
      val meter = new StageMeter
      spark.sparkContext.addSparkListener(meter)
      val cached = TextPipeline.editDistancePairsCached(docs, maxDist = 10,
        n = 2, maxDf = 10L, bandedConfirm = b)
      val t0 = System.nanoTime()
      val rows = cached.result.count()
      val wall = (System.nanoTime() - t0) / 1e9
      meter.settle()
      spark.sparkContext.removeSparkListener(meter)
      cached.unpersist(blocking = true)
      val snap = meter.stages.synchronized(meter.stages.toSeq)
      val execTotal = snap.map(_._3).sum
      val gcTotal = snap.map(_._4).sum
      val top = snap.sortBy(-_._3).take(5)
      println(f"""{"variant":"$tag","n_docs":$nDocs,"rows":$rows,""" +
        f""""wall_sec":$wall%.1f,"exec_sec":$execTotal%.1f,""" +
        f""""gc_sec":$gcTotal%.1f,"max_stage_exec_sec":${
          top.headOption.map(_._3).getOrElse(0.0)}%.1f}""")
      top.foreach { case (id, ops, exec, gc, tasks) =>
        println(f"  [$tag] stage $id%4d exec $exec%8.1f s  gc $gc%6.1f s  " +
          f"tasks $tasks%4d  " + ops.split(",").take(5).mkString(","))
      }
    }
    spark.stop()
  }
}

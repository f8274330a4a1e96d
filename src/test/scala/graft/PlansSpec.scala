package graft

import org.apache.spark.sql.functions._
import graft.plans.ApproxDistinctRewrite

class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("ApproxDistinctRewrite: count_distinct becomes HLL only under the flag") {
    val df = (0 until 500).map(i => (i % 7, s"v${i % 40}")).toDF("g", "x")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ApproxDistinctRewrite
    try {
      def planOf() = df.groupBy("g").agg(count_distinct(col("x")).as("d"))
        .queryExecution.optimizedPlan.toString
      // flag off: exact distinct survives
      spark.conf.set("spark.graft.approxDistinct", "false")
      assert(!planOf().contains("approx_count_distinct"))
      // flag on: rewritten to the sketch, values within rsd on small data
      spark.conf.set("spark.graft.approxDistinct", "true")
      assert(planOf().contains("approx_count_distinct"))
      val approx = df.groupBy("g").agg(count_distinct(col("x")).as("d"))
        .collect().map(_.getLong(1))
      assert(approx.forall(d => d >= 36 && d <= 44)) // 40 distinct, 5% rsd
    } finally {
      spark.conf.set("spark.graft.approxDistinct", "false")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == ApproxDistinctRewrite)
    }
  }

  test("Curation plans: benchmark side broadcasts; chunk and mix are shuffle-free") {
    import graft.pipeline.Curation
    val docs = (0L until 100L).map(i =>
      (i, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7} w${(i + 3) % 7} tail$i",
        s"src${i % 3}")).toDF("doc_id", "text", "source")
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val cont = Curation.contamination(docs, bench, 3)
      .queryExecution.executedPlan.toString
    // the eval set must never be the streamed side of a shuffle join
    assert(cont.contains("BroadcastHashJoin"))
    assert(!cont.contains("CartesianProduct"))
    // chunking explodes in place — one pass, no shuffle
    assert(!Curation.chunk(docs, 8, 8)
      .queryExecution.executedPlan.toString.contains("Exchange"))
    // mixing is a pure filter on a deterministic hash — pushes to the scan
    assert(!Curation.sampleBySource(docs, Map("src0" -> 0L))
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("PQ plans: codebook and query table broadcast; vocab cut is TakeOrdered") {
    import graft.pipeline.{Similarity, TextPipeline}
    val emb = (0L until 64L).map(i => (i, Seq.fill(8)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val pq = Similarity.annPq(emb, emb.filter(col("vec_id") < 2),
      m = 4, ksub = 4, k = 3).queryExecution.executedPlan.toString
    // ADC never shuffles embeddings: codebook + query table are broadcast,
    // the only exchange is the (query, nbr) partial-agg sum
    assert(pq.contains("BroadcastHashJoin"))
    assert(!pq.contains("CartesianProduct") && !pq.contains("SortMergeJoin"))
    val vocabPlan = TextPipeline.vocab(
      Seq((1L, "a b c")).toDF("doc_id", "text"), 10)
      .queryExecution.executedPlan.toString
    assert(vocabPlan.contains("TakeOrderedAndProject")) // no corpus-wide sort
  }

  test("ApproxDistinctRewrite leaves filtered and multi-arg distincts alone") {
    val df = (0 until 100).map(i => (i % 3, i % 10, i % 5)).toDF("g", "x", "y")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ApproxDistinctRewrite
    try {
      spark.conf.set("spark.graft.approxDistinct", "true")
      val multi = df.groupBy("g").agg(count_distinct(col("x"), col("y")).as("d"))
      assert(!multi.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
      assert(multi.collect().map(_.getLong(1)).max == 10L) // still exact
    } finally {
      spark.conf.set("spark.graft.approxDistinct", "false")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == ApproxDistinctRewrite)
    }
  }
}

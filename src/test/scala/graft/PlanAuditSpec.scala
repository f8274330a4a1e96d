package graft

import org.apache.spark.sql.functions._
import graft.tools.PlanAudit

class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  test("rules fire on anti-patterns and pass the legitimate forms") {
    val big = spark.range(100000).toDF("id")
    val big2 = spark.range(100000).toDF("id2")
    // cartesian of two unbounded sides: flagged
    assert(PlanAudit.audit(big.crossJoin(big2)).exists(_.rule == "cartesian"))
    // scalar attach — cross join against a grand-total 1-row aggregate:
    // the legitimate pattern (bm25's avgdl/N broadcast), passes
    assert(PlanAudit.audit(
      big.crossJoin(big2.agg(count(lit(1)).as("n")))).isEmpty)
    // inner join that degenerated to no condition: flagged
    assert(PlanAudit.audit(big.join(big2)).exists(_.rule == "cartesian"))
    // global window over an unbounded input: flagged
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
    assert(PlanAudit.audit(big.withColumn("r", row_number().over(w)))
      .exists(_.rule == "global-window"))
    // global window over a limit(k) result: bounded, passes
    assert(PlanAudit.audit(
      big.orderBy(col("id")).limit(20)
        .withColumn("r", row_number().over(w))).isEmpty)
    // partitioned window over unbounded input: passes
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id") % 10).orderBy(col("id"))
    assert(PlanAudit.audit(
      big.withColumn("r", row_number().over(pw))).isEmpty)
    // RDD detour: flagged; LocalRelation literals pass
    val viaRdd = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L))),
      new org.apache.spark.sql.types.StructType()
        .add("id", org.apache.spark.sql.types.LongType))
    assert(PlanAudit.audit(viaRdd, flagRddScan = true)
      .exists(_.rule == "rdd-scan"))
    assert(PlanAudit.audit(Seq(1L).toDF("id"), flagRddScan = true).isEmpty)
    // explicit broadcast hint on a cross join = author-asserted small
    // side (codebook/centroid attach): passes the logical rule, but the
    // PHYSICAL bnlj rule still fires — the hint picks the strategy, it
    // does not bound the rows the nested loop multiplies by
    assert(PlanAudit.audit(big.crossJoin(broadcast(big2)))
      .forall(_.rule == "bnlj"))
  }

  test("bnlj rule: unbounded build sides fail, metadata-sized ones prove out") {
    val big = spark.range(100000).toDF("id")
    val big2 = spark.range(100000).toDF("id2")
    // hinted-broadcast non-equi join over an unbounded side: flagged
    assert(PlanAudit.audit(big.join(broadcast(big2), col("id") =!= col("id2")))
      .exists(_.rule == "bnlj"))
    // ...whitelisted when the caller declares the exact tier
    assert(PlanAudit.audit(big.join(broadcast(big2), col("id") =!= col("id2")),
      allowBnlj = true).isEmpty)
    // aggregate-to-one-row build side (the bm25 avgdl / unigram-nll
    // totals shape): provably one row -> passes
    assert(PlanAudit.audit(
      big.crossJoin(big2.agg(count(lit(1)).as("n")))).isEmpty)
    assert(PlanAudit.audit(big.join(
      broadcast(big2.agg(max(col("id2")).as("m"))),
      col("id") =!= col("m"))).isEmpty)
    // limit-k build side: bounded -> passes
    assert(PlanAudit.audit(
      big.join(broadcast(big2.orderBy(col("id2")).limit(5)),
        col("id") =!= col("id2"))).isEmpty)
    // LocalRelation build side: bounded -> passes
    assert(PlanAudit.audit(
      big.join(broadcast(Seq(1L, 2L).toDF("id2")),
        col("id") =!= col("id2"))).isEmpty)
    // a grouped aggregate does NOT bound rows: flagged
    assert(PlanAudit.audit(
      big.join(broadcast(big2.groupBy(col("id2") % 77777).agg(
        count(lit(1)).as("c"))), col("id") =!= col("c")))
      .exists(_.rule == "bnlj"))
  }

  test("every registered query plan is free of scale anti-patterns") {
    val dir = "/root/testdata/sf0.001"
    // BNLJ whitelist — each row's build side is metadata-sized by
    // construction but not statically provable, adjudicated here in
    // code rather than in a ledger note:
    //  - q_embed_knn / q_embed_knn_int8 / q_ann_recall / q_margin_mine:
    //    the exact brute-force tier, every-query-x-every-vector BY
    //    CONSTRUCTION (the recall baseline / hard-negative miner the
    //    ANN tiers are measured against)
    //  - q_embed_centroid: the build side is the per-class centroid
    //    aggregate — one row per class label (a grouped aggregate, so
    //    the static proof can't bound it)
    //  - q_embed_ann_ivfpq_idx / q_embed_ann_ivfpq_batch: the build
    //    side is the PERSISTED index's centroid table re-read from
    //    parquet (nlist = sqrt(N) rows written by IvfPqIndex.build — a
    //    FileScan carries no static row bound); the batch twin differs
    //    only in its codes union, not the centroid build side
    val exactKnnTier = Set("q_embed_knn", "q_embed_knn_int8", "q_ann_recall",
      "q_margin_mine", "q_embed_centroid", "q_embed_ann_ivfpq_idx",
      "q_embed_ann_ivfpq_batch")
    val findings = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try PlanAudit.audit(fn(spark, dir),
          allowBnlj = exactKnnTier(name)).map(f => s"$name: $f")
        catch { case e: Throwable =>
          Seq(s"$name: [audit-error] ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(200)}")
        } finally spark.catalog.clearCache()
    }
    assert(findings.isEmpty, findings.mkString("\n", "\n", ""))
  }
}

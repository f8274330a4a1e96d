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
    // side (codebook/centroid attach): passes
    assert(PlanAudit.audit(big.crossJoin(broadcast(big2))).isEmpty)
  }

  test("every registered query plan is free of scale anti-patterns") {
    val dir = "/root/testdata/sf0.001"
    val findings = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try PlanAudit.audit(fn(spark, dir)).map(f => s"$name: $f")
        catch { case e: Throwable =>
          Seq(s"$name: [audit-error] ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(200)}")
        } finally spark.catalog.clearCache()
    }
    assert(findings.isEmpty, findings.mkString("\n", "\n", ""))
  }
}

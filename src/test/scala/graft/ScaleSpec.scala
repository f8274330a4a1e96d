package graft

import org.apache.spark.sql.functions._
import graft.scale.Skew

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals plain groupBy on skewed data") {
    // hot key: 90% of rows on one key
    val rows = (0 until 1000).map(i =>
      (if (i < 900) "hot" else s"k${i % 17}", i.toLong))
    val df = rows.toDF("k", "v").repartition(8)
    val plain = df.groupBy("k").agg(sum("v").as("total"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, col("k"), buckets = 4,
      Seq(sum("v").as("s"), count(lit(1)).as("c")),
      Seq(sum("s").as("total"), sum("c").as("cnt")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("tiledPairs equals the naive same-key self-join, hot and cold keys") {
    // one degenerate key with 57 rows (tiled into ceil(57/8)=8 tiles),
    // several cold keys (pass through untiled), ids deliberately NOT
    // aligned with row positions
    val rows = ((0 until 57).map(i => ((i * 37 + 11) % 1000 + 1000L, "hot")) ++
      (0 until 30).map(i => (i.toLong, s"cold${i % 7}"))).toDF("id", "key")
    val naive = rows.as("a").join(rows.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"))
    val tiled = Skew.tiledPairs(rows, "id", "key", targetTile = 8)
    assert(tiled.count() == naive.count()) // exactly-once, pre-distinct
    assert(tiled.exceptAll(naive).isEmpty && naive.exceptAll(tiled).isEmpty)
    // degenerate single-tile edge: target larger than every key
    val one = Skew.tiledPairs(rows, "id", "key", targetTile = 1000)
    assert(one.exceptAll(naive).isEmpty && naive.exceptAll(one).isEmpty)
  }

  test("tiled candidate generation equals the default path in all three generators") {
    import graft.pipeline.{Similarity, TextPipeline}
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (0L until 40L).map { i =>
      (i, if (i % 3 == 0) base else s"unique doc $i words ${i * 7}")
    }.toDF("doc_id", "text")
    val mhPlain = TextPipeline.minhashCandidates(docs)
    val mhTiled = TextPipeline.minhashCandidates(docs, tileTarget = 4L)
    assert(mhTiled.exceptAll(mhPlain).isEmpty && mhPlain.exceptAll(mhTiled).isEmpty)
    val shPlain = TextPipeline.simhashCandidates(docs)
    val shTiled = TextPipeline.simhashCandidates(docs, tileTarget = 4L)
    assert(shTiled.exceptAll(shPlain).isEmpty && shPlain.exceptAll(shTiled).isEmpty)
    val emb = (0L until 40L).map { i =>
      (i, (0 until 8).map(d =>
        (((i % 4) * 31 + d * 7) % 13 - 6).toFloat / 6f + i.toFloat / 5000f))
    }.toDF("vec_id", "embedding")
    val lshPlain = Similarity.annLshBanded(emb, planes = 8, bands = 2, minCosine = 0.8)
    val lshTiled = Similarity.annLshBanded(emb, planes = 8, bands = 2,
      minCosine = 0.8, tileTarget = 4L)
    assert(lshTiled.exceptAll(lshPlain).isEmpty && lshPlain.exceptAll(lshTiled).isEmpty)
    val ndPlain = TextPipeline.nearDupJaccard(docs, n = 2, minJaccard = 0.1)
    val ndTiled = TextPipeline.nearDupJaccard(docs, n = 2, minJaccard = 0.1,
      tileTarget = 4L)
    assert(ndTiled.exceptAll(ndPlain).isEmpty && ndPlain.exceptAll(ndTiled).isEmpty)
    assert(lshPlain.count() > 0 && shPlain.count() > 0 && mhPlain.count() > 0 &&
      ndPlain.count() > 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Paths.get("spark-warehouse")
    try {
      val left = (0L until 500L).map(i => (i, s"l$i")).toDF("id", "l")
      val right = (0L until 500L).map(i => (i, i * 2)).toDF("id", "r")
      Skew.writeBucketed(left, "bk_left", "id", 8)
      Skew.writeBucketed(right, "bk_right", "id", 8)
      // force sort-merge (tiny inputs would broadcast, which has no hash
      // exchange either and would prove nothing about bucketing)
      val joined = spark.table("bk_left").hint("merge")
        .join(spark.table("bk_right"), "id")
      assert(joined.count() == 500)
      assert(Skew.hasNoShuffle(joined),
        "bucketed join should have no hashpartitioning exchange:\n" +
          joined.queryExecution.executedPlan.toString)
      // contrast: the same join as sort-merge on plain tables needs a
      // shuffle (hint forces SMJ — tiny inputs would broadcast otherwise)
      val plain = left.hint("merge").join(right, "id")
      assert(!Skew.hasNoShuffle(plain))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
      if (java.nio.file.Files.exists(wh)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(wh).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }
}

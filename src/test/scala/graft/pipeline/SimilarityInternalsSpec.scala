package graft.pipeline

import org.apache.spark.sql.functions._
import graft.expressions.{VectorExpressions => Vec}

/** Pins the internals of the fused IVF-PQ encode path: the fused
  * single-scan encode must be bit-identical to the unfused
  * assign-then-encode composition it replaced, and the driver-side
  * codebook must be a task-free local relation with the exact
  * rank/slice semantics of the old distributed formulation. */
class SimilarityInternalsSpec extends graft.SparkSpec {
  import spark.implicits._

  test("fusedEncode == unfused coarse-assign + pqAssignment composition") {
    val vecs = (0 until 24).map { i =>
      val base = if (i % 3 == 0) 1.0f else if (i % 3 == 1) -1.0f else 0.5f
      (i.toLong, Seq.tabulate(7)(d => base * (1.0f + (i + d) * 0.013f)))
    }
    val e = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("vec"))
    val m = 3 // 7 % 3 != 0 → last subspace absorbs the remainder
    val cents = Similarity.collectedSample(e, 5)
    val codebook = Similarity.pqCodebook(cents.limit(4), m)
    // unfused twin: two corpus scans joined on vec_id
    val coarse = e.crossJoin(broadcast(cents))
      .withColumn("csim", round(Vec.cosine(col("vec"), col("cvec")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("csim"), -col("cid"))).as("cid"))
    val unfused = Similarity.pqAssignment(e, codebook, m)
      .groupBy("vec_id")
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code")))),
        s => s.getField("code").cast("int")).as("codes"))
      .join(coarse, Seq("vec_id"))
    def keyed(df: org.apache.spark.sql.DataFrame) = rowsOf(df).map(r =>
      r("vec_id") -> ((r("codes").asInstanceOf[scala.collection.Seq[Int]].toSeq, r("cid")))).toMap
    val fused = keyed(Similarity.fusedEncode(e, cents, codebook, m))
    assert(fused == keyed(unfused))
    assert(fused.size == 24)
  }

  test("native and exploded encode paths agree, including degenerate vectors") {
    // corpus with a dimension-mismatched vector (dim 9 vs the dim-7
    // sample) and a null-element vector: both must be dropped WHOLE by
    // every path — no partial code sets, no garbage min-codes
    val good = (0 until 12).map { i =>
      (i.toLong, Seq.tabulate(7)(d => 0.3 + (i * 7 + d) * 0.011))
    }
    val degenerate = Seq(
      (100L, Seq.tabulate(9)(d => 0.5 + d * 0.01)),       // wrong dim
      (101L, null.asInstanceOf[Seq[Double]]))             // null vec
    val e = (good ++ degenerate).toDF("vec_id", "vec")
    val eGood = good.toDF("vec_id", "vec")
    val m = 3
    val cents = Similarity.collectedSample(eGood, 4)
    val codebook = Similarity.pqCodebook(cents.limit(4), m)
    def pq(df: org.apache.spark.sql.DataFrame) = rowsOf(df).map(r =>
      (r("vec_id"), r("sub"), r("code"))).toSet
    val pqNative = pq(Similarity.pqAssignment(e, codebook, m))
    val pqExploded = pq(Similarity.pqAssignmentExploded(e, codebook, m))
    assert(pqNative == pqExploded, "pqAssignment paths diverged")
    assert(!pqNative.exists(_._1 == 100L) && !pqNative.exists(_._1 == 101L))
    assert(pqNative.size == 12 * 3)
    def fe(df: org.apache.spark.sql.DataFrame) = rowsOf(df).map(r =>
      r("vec_id") -> ((Option(r("codes"))
        .map(_.asInstanceOf[scala.collection.Seq[Int]].toSeq), r("cid")))).toMap
    val feNative = fe(Similarity.fusedEncode(e, cents, codebook, m))
    val feExploded = fe(Similarity.fusedEncodeExploded(e, cents, codebook, m))
    assert(feNative == feExploded, "fusedEncode paths diverged")
    assert(!feNative.contains(100L) && !feNative.contains(101L))
    assert(feNative.size == 12)
  }

  test("encode paths agree on non-finite cosines (NaN vs finite per centroid)") {
    // A vector of ~1e200 elements overflows its own norm to Infinity:
    // against a small centroid the dot product stays finite → cosine
    // finite/Inf = 0.0, but against an equally-huge centroid the dot
    // overflows too → Inf/Inf = NaN. The native NearestCentroid ranks
    // NaN best (java.lang.Double.compare), so the exploded fallback's
    // min_by on the negated cosine must map NaN → -Infinity or the two
    // paths would silently assign different cids across the 8192
    // codebook-size threshold.
    val cents = Seq(
      (0L, Seq.tabulate(7)(d => 0.1 * (d + 1))),
      (1L, Seq.tabulate(7)(d => 1.0e200 * (d + 1)))).toDF("cid", "cvec")
    val m = 3
    val codebook = Similarity.pqCodebook(cents, m)
    val e = Seq(
      (0L, Seq.tabulate(7)(d => 1.0e200 + d)), // NaN vs cid 1, 0.0 vs cid 0
      (1L, Seq.tabulate(7)(d => 0.2 + d * 0.01))) // all-finite control
      .toDF("vec_id", "vec")
    def fe(df: org.apache.spark.sql.DataFrame) = rowsOf(df).map(r =>
      r("vec_id") -> ((Option(r("codes"))
        .map(_.asInstanceOf[scala.collection.Seq[Int]].toSeq), r("cid")))).toMap
    val feNative = fe(Similarity.fusedEncode(e, cents, codebook, m))
    val feExploded = fe(Similarity.fusedEncodeExploded(e, cents, codebook, m))
    assert(feNative == feExploded,
      s"non-finite cosine diverged: native=$feNative exploded=$feExploded")
    // and the specific contract: the NaN-cosine centroid wins, as in
    // the native Double.compare order
    assert(feNative(0L)._2 == 1L)
    assert(feNative.size == 2)
  }

  test("pqCodebook is a task-free local relation with rank/slice semantics") {
    val cents = Seq(
      (30L, Seq(1.0, 2.0, 3.0, 4.0, 5.0)),
      (10L, Seq(9.0, 8.0, 7.0, 6.0, 5.0))).toDF("cid", "cvec")
    val cb = Similarity.pqCodebook(cents, m = 2)
    // local relation: broadcasting it never schedules a corpus job
    assert(cb.queryExecution.optimizedPlan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
    val rows = rowsOf(cb).map(r =>
      (r("code"), r("sub")) -> r("csubvec").asInstanceOf[scala.collection.Seq[Double]].toSeq).toMap
    // codes are 0-based ranks of cid: cid 10 → code 0, cid 30 → code 1
    assert(rows((0, 0)) == Seq(9.0, 8.0))
    assert(rows((0, 1)) == Seq(7.0, 6.0, 5.0)) // last subspace absorbs 5 % 2
    assert(rows((1, 0)) == Seq(1.0, 2.0))
    assert(rows((1, 1)) == Seq(3.0, 4.0, 5.0))
    assert(rows.size == 4)
  }
}

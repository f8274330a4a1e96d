package graft

import org.apache.spark.storage.StorageLevel
import graft.pipeline.{Similarity, TextPipeline}

/** The Cached[_] release contract: every index-building operator's `*Cached`
  * variant (a) actually persists its backing index, (b) releases it on
  * `unpersist(blocking = true)`, and (c) the result stays correct after
  * release (recomputes instead of dangling). */
class CachedSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    1L -> "alpha beta gamma delta epsilon zeta",
    2L -> "alpha beta gamma delta epsilon zeta",
    3L -> "completely different words entirely here now",
    4L -> "alpha beta gamma delta epsilon eta").toDF("doc_id", "text")

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.05f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.2f, 0.0f))).toDF("vec_id", "embedding")

  /** Count of persisted RDDs in the shared context — the handle must not
    * leave residue behind (delta, not absolute: other suites share the
    * session). */
  private def persisted: Int = spark.sparkContext.getPersistentRDDs.size

  private def checkRelease(mk: => graft.core.Cached[org.apache.spark.sql.DataFrame],
      force: org.apache.spark.sql.DataFrame => Long = _.count()): Unit = {
    val before = persisted
    val h = mk
    assert(h.isCached, "backing index should be marked persistent at build time")
    val n1 = force(h.result)
    assert(persisted > before, "materializing the result should register the index RDD")
    h.unpersist(blocking = true)
    assert(!h.isCached, "handle must report released")
    assert(persisted == before, "unpersist must drop the index RDD from the context")
    assert(force(h.result) == n1, "result must recompute identically after release")
  }

  test("nearDupJaccardCached releases its inverted index") {
    checkRelease(TextPipeline.nearDupJaccardCached(docs, n = 2, minJaccard = 0.3))
  }

  test("nearDupJaccardCached with df-cap releases its inverted index") {
    checkRelease(TextPipeline.nearDupJaccardCached(docs, n = 2, minJaccard = 0.1, maxDf = 3L))
  }

  test("minhashCandidatesCached releases its bucket frame") {
    checkRelease(TextPipeline.minhashCandidatesCached(docs))
  }

  test("simhashCandidatesCached releases its signature frame") {
    checkRelease(TextPipeline.simhashCandidatesCached(docs))
  }

  test("annLshBandedCached releases its bucket frame") {
    checkRelease(Similarity.annLshBandedCached(emb, planes = 8, bands = 4, minCosine = 0.9))
  }

  test("dupSpansCached releases its gram frame") {
    checkRelease(TextPipeline.dupSpansCached(docs, k = 3))
  }

  test("removeDupSpansCached releases its gram frame") {
    // plain count() would let Catalyst eliminate the outer join (unique
    // right keys, no right columns referenced) and never touch the gram
    // frame — force text_clean so the measured path actually runs
    checkRelease(TextPipeline.removeDupSpansCached(docs, k = 3),
      _.filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text_clean")) >= 0).count())
  }

  test("semDedupCached releases its assignment frame") {
    checkRelease(Similarity.semDedupCached(emb, nlist = 2, minCosine = 0.9))
  }

  test("dsirWeightsCached (raw = corpus) releases the shared gram frame") {
    val corpus = docs
    checkRelease(graft.pipeline.Curation.dsirWeightsCached(
      corpus, corpus.limit(2), corpus, buckets = 64))
  }

  test("dsirSelectCached releases the gram frame and the score frame") {
    val corpus = docs
    checkRelease(graft.pipeline.Curation.dsirSelectCached(
      corpus, corpus.limit(2), keepFrac = 0.5, buckets = 64))
  }

  test("plain variants still return the same rows as the cached result") {
    val h = TextPipeline.minhashCandidatesCached(docs)
    val plainRows = rowsOf(TextPipeline.minhashCandidates(docs)).toSet
    assert(rowsOf(h.result).toSet == plainRows)
    h.unpersist(blocking = true)
    // release the plain variant's own (handle-less) cache so this suite
    // leaves the shared session clean
    spark.catalog.clearCache()
  }

  test("storage level of the backing frame is MEMORY_AND_DISK until released") {
    val h = TextPipeline.simhashCandidatesCached(docs)
    assert(h.isCached)
    h.result.count()
    h.unpersist(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.values
      .forall(_.getStorageLevel == StorageLevel.NONE) ||
      spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}

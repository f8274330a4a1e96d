package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Incremental near-dup candidate maintenance — the compaction path
  * [[Curation.curateStream]] defers to batch. A streaming corpus cannot
  * run corpus-wide LSH self-joins with bounded state, but it does not
  * need to: candidate pairs against everything ALREADY INGESTED only
  * require the historical band-key table, which is an append-only
  * parquet store, not streaming state.
  *
  * Per increment ([[ingest]] / [[ingestSimhash]] / [[ingestEmbeddings]] /
  * [[ingestSemantic]]):
  *   1. band-key the new batch with the SAME key derivation as the
  *      corresponding batch operator ([[TextPipeline.minhashLsh]] /
  *      [[TextPipeline.simhashBandKeys]] / [[Similarity.lshBandKeys]]),
  *      so buckets agree by construction;
  *   2. candidates = (new × new within the batch) ∪ (store × new on
  *      shared bucket) — the new side of the cross join is the small
  *      side (one increment vs the whole history) and is broadcast;
  *   3. verify schemes re-attach signatures/vectors (from the payload
  *      store plus the batch) for the exact hamming/cosine confirmation
  *      the batch operator applies;
  *   4. append the batch's keys (and payload) to the store.
  *
  * Every candidate pair is emitted exactly once, at the ingest of its
  * LATER member — so the union of all increments' outputs equals the
  * batch operator over the union of all batches (spec-pinned per scheme
  * and oracle-checked). The store only ever grows by the increment's
  * rows; nothing is rewritten, which is what makes this run as a
  * foreachBatch against a 100 TB history.
  *
  * Store reads use an explicit file-list snapshot taken at ingest time
  * and results are pinned with an eager localCheckpoint, so a
  * lazily-held candidates frame never sees later appends.
  *
  * `maxBucket` caps bucket size on BOTH pair branches at each ingest:
  * the store side (hot boilerplate buckets would otherwise make every
  * future increment pay d pairs per new member) and the within-batch
  * new×new self-join (one boilerplate-heavy increment would otherwise
  * owe d² pairs through the single reducer owning that bucket — the
  * same failure [[TextPipeline.capBuckets]] guards in the batch
  * twins). Unlike the batch cap it cannot retroactively drop pairs
  * emitted before a bucket crossed the cap, and the APPENDED keys are
  * always uncapped (the store keeps everything; caps apply at read).
  * `tileTarget` is the recall-lossless alternative for the
  * within-batch branch: hot batch buckets are 2-D tiled over the
  * cluster ([[graft.scale.Skew.tiledPairs]]) instead of dropped.
  */
object IncrementalDedup {

  /** Band-key table (doc_id, bucket) for a batch. */
  def index(docs: DataFrame, n: Int = 3, k: Int = 16,
            bands: Int = 4): DataFrame =
    TextPipeline.minhashLsh(docs, n, k, bands).select("doc_id", "bucket")

  // ----- store plumbing ---------------------------------------------------

  /** Snapshot of a store table's current parquet files (empty frame with
    * `schema` when the table doesn't exist yet). */
  private def snapshot(spark: SparkSession, dir: String, table: String,
                       schema: StructType): DataFrame = {
    val p = new Path(s"$dir/$table")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      if (!fs.exists(p)) Array.empty[String]
      else fs.listStatus(p).map(_.getPath.toString)
        .filter(f => f.endsWith(".parquet"))
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(files: _*)
  }

  private def keySchema(idCol: String) = StructType(Seq(
    StructField(idCol, LongType), StructField("bucket", StringType)))

  /** Core exactly-once pair emission: (new × new) ∪ (capped store × new,
    * new side broadcast), oriented a < b. Caller appends the keys AFTER
    * materializing its result.
    *
    * The within-batch self-join honors the same hot-bucket guards as
    * the batch operators: `maxBucket` drops over-cap batch buckets
    * before pairing (lossy, cheap); `tileTarget` tiles them instead
    * (lossless, spreads the d² output over the cluster). `tileTarget`
    * wins when both are set. The store×new branch needs neither — it
    * is a broadcast join whose output explosion is spread over the
    * store's scan partitions, and the store side is already capped. */
  private[graft] def keyedPairs(store: DataFrame, newKeys: DataFrame,
                         idCol: String, outA: String, outB: String,
                         maxBucket: Long, tileTarget: Long): DataFrame = {
    val capped = TextPipeline.capBuckets(store, maxBucket)
    val within =
      if (tileTarget > 0L)
        graft.scale.Skew.tiledPairs(newKeys, idCol, "bucket", tileTarget)
          .select(col("a").as(outA), col("b").as(outB))
      else {
        val nw = TextPipeline.capBuckets(newKeys, maxBucket)
        nw.as("a").join(nw.as("b"),
            col(s"a.bucket") === col(s"b.bucket") &&
              col(s"a.$idCol") < col(s"b.$idCol"))
          .select(col(s"a.$idCol").as(outA), col(s"b.$idCol").as(outB))
      }
    val cross = capped.as("s").join(broadcast(newKeys.as("nw")),
        col(s"s.bucket") === col(s"nw.bucket") &&
          col(s"s.$idCol") =!= col(s"nw.$idCol"))
      .select(least(col(s"s.$idCol"), col(s"nw.$idCol")).as(outA),
        greatest(col(s"s.$idCol"), col(s"nw.$idCol")).as(outB))
    within.union(cross).distinct()
  }

  // ----- minhash scheme (word-shingle Jaccard candidates) -----------------

  /** Ingest one batch: return its candidate pairs (within-batch and
    * against the pre-existing store, `doc_a < doc_b`), then append the
    * batch's band keys to the store. Batch twin:
    * [[TextPipeline.minhashCandidates]]. */
  def ingest(dir: String, docs: DataFrame, n: Int = 3, k: Int = 16,
             bands: Int = 4, maxBucket: Long = 0L,
             tileTarget: Long = 0L): DataFrame = {
    val spark = docs.sparkSession
    val newKeys = index(docs, n, k, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val store = snapshot(spark, dir, "keys", keySchema("doc_id"))
    val result =
      keyedPairs(store, newKeys, "doc_id", "doc_a", "doc_b", maxBucket,
        tileTarget)
        .localCheckpoint(true) // pin results before the store grows
    newKeys.write.mode("append").parquet(s"$dir/keys")
    newKeys.unpersist()
    result
  }

  // ----- simhash scheme (Hamming-confirmed candidates) --------------------

  /** Simhash ingest: bit-band candidate pairing plus the exact Hamming
    * confirmation over full 47-bit signatures (old signatures read from
    * the payload store). Output (doc_a, doc_b, hamming) — batch twin:
    * [[TextPipeline.simhashCandidates]]. */
  def ingestSimhash(dir: String, docs: DataFrame, bands: Int = 4,
                    maxHamming: Int = 3, maxBucket: Long = 0L,
                    tileTarget: Long = 0L): DataFrame = {
    val spark = docs.sparkSession
    val newSigs = TextPipeline.simhash(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newKeys = newSigs.select(col("doc_id"),
      explode(TextPipeline.simhashBandKeys(col("simhash"), bands)).as("bucket"))
    val storeKeys = snapshot(spark, dir, "keys", keySchema("doc_id"))
    val pairs =
      keyedPairs(storeKeys, newKeys, "doc_id", "doc_a", "doc_b", maxBucket,
        tileTarget)
    val sigs = snapshot(spark, dir, "sigs", StructType(Seq(
        StructField("doc_id", LongType), StructField("simhash", LongType))))
      .union(newSigs)
    val result = pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("simhash").as("sig_a")),
        Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("simhash").as("sig_b")),
        Seq("doc_b"))
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .localCheckpoint(true)
    newKeys.write.mode("append").parquet(s"$dir/keys")
    newSigs.write.mode("append").parquet(s"$dir/sigs")
    newSigs.unpersist()
    result
  }

  // ----- winnowing scheme (shared-fingerprint overlap candidates) ---------

  /** Winnowing ingest — the incremental face of
    * [[TextPipeline.winnowCandidates]]: document pairs sharing at least
    * `minShared` winnowing fingerprints, each pair emitted exactly once
    * (at the ingest of its later member). The shared COUNT is exact at
    * emission time: the later member's full fingerprint set is in the
    * batch and the earlier member's is in the append-only store, so
    * every shared fingerprint appears as exactly one bucket-join match
    * in exactly one branch (a pair is either both-in-batch or
    * store×new — the store never contains batch members). Fingerprints
    * come from the zero-shuffle native expression; the store grows by
    * the batch's (doc_id, fp) rows only.
    *
    * `maxDocs` caps fingerprint document-frequency per branch at ingest
    * time (the batch twin caps on corpus-wide df — same boilerplate
    * rationale, visibility-scoped like every incremental cap here). */
  def ingestWinnow(dir: String, docs: DataFrame, k: Int = 5, w: Int = 4,
                   minShared: Long = 2L, maxDocs: Long = 0L): DataFrame = {
    val spark = docs.sparkSession
    val newKeys = TextPipeline.winnowFingerprintsNative(docs, k, w)
      .select(col("doc_id"), col("fp").cast("string").as("bucket")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val store = snapshot(spark, dir, "winnow_keys", keySchema("doc_id"))
    val result = winnowPairsCore(store, newKeys, minShared, maxDocs)
      .localCheckpoint(true) // pin results before the store grows
    newKeys.write.mode("append").parquet(s"$dir/winnow_keys")
    newKeys.unpersist()
    result
  }

  /** The winnow shared-count core shared by [[ingestWinnow]] and the
    * streaming face ([[graft.streaming.CurationStream.winnowPairs]]):
    * exact per-pair shared-fingerprint counts over (store × new) ∪
    * (new × new). */
  private[graft] def winnowPairsCore(store: DataFrame, newKeys: DataFrame,
                                     minShared: Long,
                                     maxDocs: Long): DataFrame = {
    val cappedStore = TextPipeline.capBuckets(store, maxDocs)
    val cappedNew = TextPipeline.capBuckets(newKeys, maxDocs)
    val within = cappedNew.as("a").join(cappedNew.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val cross = cappedStore.as("s").join(broadcast(cappedNew.as("nw")),
        col("s.bucket") === col("nw.bucket") &&
          col("s.doc_id") =!= col("nw.doc_id"))
      .select(least(col("s.doc_id"), col("nw.doc_id")).as("doc_a"),
        greatest(col("s.doc_id"), col("nw.doc_id")).as("doc_b"))
    within.union(cross)
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  // ----- span scheme (duplicate k-gram positions) -------------------------

  /** Span-dedup ingest — the incremental face of
    * [[TextPipeline.dupSpans]]: emit every (doc_id, pos) whose k-gram
    * becomes duplicated AT THIS INGEST, exactly once across increments,
    * so the union of all increments' outputs equals the batch
    * operator's position set over the union of all batches
    * (spec-pinned and oracle-checked).
    *
    * Two append-only tables make that cheap against a 100 TB history:
    * `grams` (doc_id, pos, h) and `hcounts` (h, cnt) — per-batch
    * PARTIAL counts whose sum is the store count, so the ingest's
    * count lookup aggregates the compact counts table (join-pruned to
    * the batch's hashes, broadcast), never the gram inventory. Emission
    * rule per batch hash with store count s and batch count b:
    * batch occurrences emit when s + b > 1; the store's occurrence
    * emits only when s == 1 (its gram was unique until now — s ≥ 2
    * means earlier ingests already emitted it), fetched from `grams`
    * by the (rare by definition) singles hash set. Hot boilerplate
    * grams therefore cost b rows per batch and one counts row —
    * never a store-wide scan. */
  def ingestSpans(dir: String, docs: DataFrame, k: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val newGrams = TextPipeline.spanGramsOf(docs, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batchCounts = newGrams.groupBy("h").agg(count(lit(1)).as("b"))
    val hcountSchema = StructType(Seq(
      StructField("h", LongType), StructField("cnt", LongType)))
    val storeCounts = snapshot(spark, dir, "hcounts", hcountSchema)
      .join(broadcast(batchCounts.select("h")), Seq("h"))
      .groupBy("h").agg(sum("cnt").as("s"))
    val j = batchCounts.join(storeCounts, Seq("h"), "left")
      .na.fill(0L, Seq("s"))
    val emitBatch = newGrams
      .join(broadcast(j.filter(col("s") + col("b") > 1).select("h")), Seq("h"))
      .select("doc_id", "pos")
    val gramSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("pos", org.apache.spark.sql.types.IntegerType),
      StructField("h", LongType)))
    val singles = snapshot(spark, dir, "grams", gramSchema)
      .join(broadcast(j.filter(col("s") === 1).select("h")), Seq("h"))
      .select("doc_id", "pos")
    val result = emitBatch.union(singles).localCheckpoint(true)
    newGrams.write.mode("append").parquet(s"$dir/grams")
    batchCounts.select(col("h"), col("b").as("cnt"))
      .write.mode("append").parquet(s"$dir/hcounts")
    newGrams.unpersist()
    result
  }

  // ----- embedding scheme (cosine-confirmed sign-LSH candidates) ----------

  /** Embedding ingest: banded sign-LSH candidate pairing plus the exact
    * cosine confirmation (old vectors read from the payload store).
    * Output (vec_a, vec_b, cosine) — batch twin:
    * [[Similarity.annLshBanded]]. */
  def ingestEmbeddings(dir: String, embeddings: DataFrame, planes: Int,
                       bands: Int, minCosine: Double,
                       maxBucket: Long = 0L,
                       tileTarget: Long = 0L): DataFrame = {
    val spark = embeddings.sparkSession
    val newVecs = embeddings
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newKeys = newVecs
      .withColumn("signs", Similarity.lshSignBits(col("vec"), planes))
      .select(col("vec_id"),
        explode(Similarity.lshBandKeys(col("signs"), planes, bands)).as("bucket"))
    val storeKeys = snapshot(spark, dir, "keys", keySchema("vec_id"))
    val pairs =
      keyedPairs(storeKeys, newKeys, "vec_id", "vec_a", "vec_b", maxBucket,
        tileTarget)
    val vecs = snapshot(spark, dir, "vecs", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("vec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
      .union(newVecs)
    val result = pairs
      .join(vecs.select(col("vec_id").as("vec_a"), col("vec").as("va")),
        Seq("vec_a"))
      .join(vecs.select(col("vec_id").as("vec_b"), col("vec").as("vb")),
        Seq("vec_b"))
      .withColumn("cosine",
        round(graft.expressions.VectorExpressions.cosine(col("va"), col("vb")), 4))
      .filter(col("cosine") >= minCosine)
      .select("vec_a", "vec_b", "cosine")
      .localCheckpoint(true)
    newKeys.write.mode("append").parquet(s"$dir/keys")
    newVecs.write.mode("append").parquet(s"$dir/vecs")
    newVecs.unpersist()
    result
  }

  // ----- semantic scheme (cluster-scoped cosine pairs, SemDeDup) ----------

  /** Semantic ingest — the incremental face of [[Similarity.semDedup]]:
    * cluster-key candidate pairing against a FROZEN coarse quantizer
    * plus the exact cosine confirmation. The quantizer is derived from
    * the FIRST batch ([[Similarity.collectedSample]]) and persisted in
    * the store (`cents`), so every later increment assigns against the
    * same centroids and buckets agree across increments by construction
    * — the frozen-codebook posture of [[IvfPqIndex.append]] (batch
    * semDedup instead re-derives centroids from the whole corpus; at
    * 100 TB the quantizer is trained once and appended against).
    *
    * Output (vec_a, vec_b, cosine), each candidate pair exactly once
    * across increments — the compaction input whose loser side
    * (higher id, [[Similarity.semDedup]]'s keep rule) is dropped
    * downstream. Here `maxBucket`/`tileTarget` guard hot CLUSTERS
    * rather than hash buckets, on the same two branches as every other
    * scheme (the cluster id is the bucket key). */
  def ingestSemantic(dir: String, embeddings: DataFrame, nlist: Int,
                     minCosine: Double, maxBucket: Long = 0L,
                     tileTarget: Long = 0L): DataFrame = {
    val spark = embeddings.sparkSession
    val newVecs = embeddings
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centPath = new Path(s"$dir/cents")
    val fs = centPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cents: DataFrame =
      if (!fs.exists(centPath)) {
        val c = Similarity.collectedSample(newVecs, nlist)
        c.write.mode("overwrite").parquet(s"$dir/cents")
        c
      } else {
        // re-inject as a local relation (tiny by construction) so the
        // assignment broadcast builds task-free, same as first ingest
        val loaded = spark.read.parquet(centPath.toString)
        spark.createDataFrame(
          java.util.Arrays.asList(loaded.collect(): _*), loaded.schema)
      }
    // same argmax as Similarity.semDedup: highest round-6 cosine, then
    // lowest cid — assignments are identical given identical centroids
    val newKeys = newVecs.crossJoin(broadcast(cents))
      .withColumn("csim",
        round(graft.expressions.VectorExpressions.cosine(
          col("vec"), col("cvec")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("csim"), -col("cid"))).as("cid"))
      .select(col("vec_id"), col("cid").cast("string").as("bucket"))
    val storeKeys = snapshot(spark, dir, "keys", keySchema("vec_id"))
    val pairs =
      keyedPairs(storeKeys, newKeys, "vec_id", "vec_a", "vec_b", maxBucket,
        tileTarget)
    val vecs = snapshot(spark, dir, "vecs", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("vec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
      .union(newVecs)
    val result = pairs
      .join(vecs.select(col("vec_id").as("vec_a"), col("vec").as("va")),
        Seq("vec_a"))
      .join(vecs.select(col("vec_id").as("vec_b"), col("vec").as("vb")),
        Seq("vec_b"))
      .withColumn("cosine",
        round(graft.expressions.VectorExpressions.cosine(col("va"), col("vb")), 4))
      .filter(col("cosine") >= minCosine)
      .select("vec_a", "vec_b", "cosine")
      .localCheckpoint(true)
    newKeys.write.mode("append").parquet(s"$dir/keys")
    newVecs.write.mode("append").parquet(s"$dir/vecs")
    newVecs.unpersist()
    result
  }
}

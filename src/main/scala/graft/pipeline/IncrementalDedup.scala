package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup candidate maintenance — the compaction path
  * [[Curation.curateStream]] defers to batch. A streaming corpus cannot
  * run corpus-wide LSH self-joins with bounded state, but it does not
  * need to: candidate pairs against everything ALREADY INGESTED only
  * require the historical band-key table, which is an append-only
  * parquet store, not streaming state.
  *
  * Per increment ([[ingest]]):
  *   1. band-key the new batch (the same [[TextPipeline.minhashLsh]]
  *      signature derivation as the batch operator — parity is exact);
  *   2. candidates = (new × new within the batch) ∪ (store × new on
  *      shared bucket) — the new side of the cross join is the small
  *      side (one increment vs the whole history) and is broadcast;
  *   3. append the new keys to the store.
  *
  * Every candidate pair is emitted exactly once, at the ingest of its
  * LATER member — so the union of all increments' outputs equals the
  * batch operator over the union of all batches (spec-pinned and
  * oracle-checked). The store only ever grows by the increment's keys;
  * nothing is rewritten, which is what makes this run as a foreachBatch
  * against a 100 TB history.
  *
  * The store is read from an explicit file-list snapshot taken at
  * ingest time, so a lazily-evaluated candidates frame stays pinned to
  * the pre-append store even after later ingests append files.
  *
  * `maxBucket` caps the STORE-side bucket size at each ingest (hot
  * boilerplate buckets would otherwise make every future increment pay
  * d pairs per new member); unlike the batch cap it cannot
  * retroactively drop pairs emitted before a bucket crossed the cap.
  */
object IncrementalDedup {

  /** Band-key table (doc_id, bucket) for a batch. */
  def index(docs: DataFrame, n: Int = 3, k: Int = 16,
            bands: Int = 4): DataFrame =
    TextPipeline.minhashLsh(docs, n, k, bands).select("doc_id", "bucket")

  private def keysDir(dir: String) = s"$dir/keys"

  /** Snapshot of the store's current parquet files (empty frame with the
    * right schema when the store doesn't exist yet). */
  private def storeSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(keysDir(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      if (!fs.exists(p)) Array.empty[String]
      else fs.listStatus(p).map(_.getPath.toString)
        .filter(f => f.endsWith(".parquet"))
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("bucket",
            org.apache.spark.sql.types.StringType))))
    else spark.read.parquet(files: _*)
  }

  /** Ingest one batch: return its candidate pairs (within-batch and
    * against the pre-existing store, `doc_a < doc_b`), then append the
    * batch's band keys to the store. */
  def ingest(dir: String, docs: DataFrame, n: Int = 3, k: Int = 16,
             bands: Int = 4, maxBucket: Long = 0L): DataFrame = {
    val spark = docs.sparkSession
    val newKeys = index(docs, n, k, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val store = TextPipeline.capBuckets(storeSnapshot(spark, dir), maxBucket)
    val within = newKeys.as("a").join(newKeys.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val cross = store.as("s").join(broadcast(newKeys.as("nw")),
        col("s.bucket") === col("nw.bucket") && col("s.doc_id") =!= col("nw.doc_id"))
      .select(least(col("s.doc_id"), col("nw.doc_id")).as("doc_a"),
        greatest(col("s.doc_id"), col("nw.doc_id")).as("doc_b"))
    val result = within.union(cross).distinct()
      .localCheckpoint(true) // pin results before the store grows
    newKeys.write.mode("append").parquet(keysDir(dir))
    newKeys.unpersist()
    result
  }
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.{VectorExpressions => Vec}

/** Persisted IVF-PQ index: the build-once / search-many separation a
  * production vector store runs at 100 TB. [[Similarity.annIvfPq]]
  * re-derives the quantizer, codebook and corpus codes on every call —
  * correct, but the encode pass is the expensive part (it touches every
  * corpus vector) while searches only need the tiny broadcast tables
  * plus the code lists. This splits them:
  *
  *   - [[IvfPqIndex.build]]: one corpus pass → centroids (nlist rows),
  *     per-subspace codebook (m·ksub rows), and packed per-vector codes
  *     (vec_id, cid, codes array) — the only corpus-sized artifact,
  *     ~m bytes per vector instead of 4·dims.
  *   - [[IvfPqIndex#save]] / [[IvfPqIndex.load]]: the three tables plus
  *     a params row as plain parquet — readable by any engine, and the
  *     codes table partitions by `cid` so a probe-limited search prunes
  *     inverted lists at the FILE level (partition pruning on the scan,
  *     the on-disk analogue of FAISS's inverted lists).
  *   - [[IvfPqIndex#search]]: centroids/probes/codebook/query-table all
  *     broadcast; the only corpus-sized work is the pruned codes scan +
  *     one partial-agg shuffle keyed by (query, neighbor). Bit-identical
  *     to [[Similarity.annIvfPq]] with the same parameters (spec-pinned
  *     and oracle-checked), including after a save/load round trip.
  *
  * Derivations (scrambled-id sample quantizer, fixed-point ADC) match
  * [[Similarity]] — see the Scaladoc there for why they are
  * deterministic and engine-portable.
  */
final case class IvfPqIndex(centroids: DataFrame, codebook: DataFrame,
                            codes: DataFrame, nlist: Int, m: Int, ksub: Int) {

  /** Write the index under `dir` (params, centroids, codebook, codes).
    * Codes partition by coarse centroid id so probe-limited reads prune
    * whole inverted lists at the scan.
    *
    * A fresh save OWNS the directory: any `codes_batches/` left by a
    * previous index at the same path is deleted first. Batches are
    * encoded against the codebook that existed when they committed —
    * unioning them under a rebuilt (different corpus / nlist / m /
    * ksub) index would silently mix codes from two quantizers, so the
    * overwrite must cover them too, not just the four base tables. */
  def save(dir: String): Unit = {
    val spark = centroids.sparkSession
    import spark.implicits._
    val batchesRoot = new org.apache.hadoop.fs.Path(s"$dir/codes_batches")
    val fs = batchesRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(batchesRoot)) fs.delete(batchesRoot, true)
    Seq((nlist, m, ksub)).toDF("nlist", "m", "ksub")
      .write.mode("overwrite").parquet(s"$dir/params")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    codebook.write.mode("overwrite").parquet(s"$dir/codebook")
    // cluster by cid BEFORE the dynamic-partition write: without it
    // every write task holds rows of ~every inverted list and opens
    // nlist files (32 tasks × 1000 cids = 32k small files, measured as
    // a single ~92 s straggler at 1M vectors); hashed on cid each list
    // is written by exactly one task — nlist files total, one per list,
    // the FAISS-like on-disk layout the probe-pruned reads want. The
    // explicit partition count keeps AQE from coalescing the tiny
    // shuffle (codes are ~m bytes/vector) below write parallelism.
    codes.repartition(32, col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$dir/codes")
  }

  /** Index grown by `newEmbeddings`, encoded against the FROZEN
    * quantizer and codebook (FAISS `add` semantics — appending never
    * retrains, so existing codes, and every result over them, are
    * untouched). Encoding a batch costs one pass over the batch only;
    * spec-pinned: build(A) + append(B) searches exactly like an index
    * whose codes were all encoded against the same tables. */
  def append(newEmbeddings: DataFrame): IvfPqIndex =
    copy(codes = codes.unionByName(
      IvfPqIndex.encode(newEmbeddings, centroids, codebook, m)))

  /** Append a batch to a SAVED index: new code files land inside the
    * existing cid-partitioned layout (parquet append touches only the
    * new files), so a reload sees old + new vectors and probe-limited
    * partition pruning keeps working. The incremental-ingestion twin of
    * [[IncrementalDedup]], for the vector side.
    *
    * CRASH CONTRACT: parquet `append` commits via multi-file renames —
    * NOT atomic across partition directories, so a kill mid-commit can
    * leave a subset of the batch visible, and a blind retry would then
    * double-encode the already-visible vectors (duplicated codes sum
    * the same (query, nbr) ADC distance twice). Ingest loops that can
    * crash and retry must use [[appendBatchTo]], which stages the whole
    * batch behind ONE directory rename and is idempotent per batch id. */
  def appendTo(dir: String, newEmbeddings: DataFrame): Unit =
    IvfPqIndex.encode(newEmbeddings, centroids, codebook, m)
      .repartition(32, col("cid")) // one writer per list — see save()
      .write.mode("append").partitionBy("cid").parquet(s"$dir/codes")

  /** Exactly-once append of one named batch to a SAVED index.
    *
    * The batch encodes into a dot-prefixed staging directory (invisible
    * to every parquet read — Spark's file index skips `.`/`_` paths),
    * then commits with a SINGLE atomic directory rename to
    * `codes_batches/batch_<id>`. Every crash window resolves on retry
    * with the same id:
    *   - killed during encode/write, or between write and rename → only
    *     the staging dir exists; reloads never see it; the retry deletes
    *     it and redoes the batch;
    *   - killed after the rename → the retry sees the committed dir and
    *     no-ops, so the batch is never double-encoded.
    * The rename is atomic on HDFS and POSIX filesystems; object stores
    * without atomic rename need their own committer underneath.
    * [[IvfPqIndex.load]] unions the base codes with every committed
    * batch; each batch stays cid-partitioned inside its directory, so
    * probe-limited partition pruning keeps working per batch. */
  def appendBatchTo(dir: String, batchId: String,
                    newEmbeddings: DataFrame): Unit = {
    require(batchId.matches("[A-Za-z0-9_-]+"),
      s"batch id must be [A-Za-z0-9_-]+, got '$batchId'")
    val spark = centroids.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = new org.apache.hadoop.fs.Path(
      s"$dir/codes_batches/batch_$batchId")
    val staging = new org.apache.hadoop.fs.Path(
      s"$dir/codes_batches/.staging_batch_$batchId")
    if (fs.exists(committed)) return // idempotent retry: already done
    if (fs.exists(staging)) fs.delete(staging, true) // crash leftover
    IvfPqIndex.encode(newEmbeddings, centroids, codebook, m)
      .repartition(32, col("cid")) // one writer per list — see save()
      .write.mode("overwrite").partitionBy("cid").parquet(staging.toString)
    if (!fs.rename(staging, committed))
      throw new java.io.IOException(
        s"could not commit batch $batchId: rename $staging -> $committed")
  }

  /** Probe-limited ADC search over the prebuilt index — same output
    * contract as [[Similarity.annIvfPq]]: (query_id, nbr_id, approx_d2,
    * rank ≤ k). */
  def search(queries: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      Similarity.asVec(queries).as("qvec"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("csim", round(Vec.cosine(col("qvec"), col("cvec")), 6))
      .withColumn("crn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("csim").desc, col("cid").asc)))
      .filter(col("crn") <= nprobe)
      .select(col("query_id"), col("cid"))
    val qtable = q
      .select(col("query_id"), col("qvec"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .withColumn("qsubvec", Similarity.subSlice(col("qvec"), col("sub"), m))
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("qd2u",
        round(Vec.l2Squared(col("qsubvec"), col("csubvec")) * 1000000.0d)
          .cast("long"))
      .select("query_id", "sub", "code", "qd2u")
    codes.join(broadcast(probes), Seq("cid"))
      .select(col("query_id"), col("vec_id").as("nbr_id"),
        posexplode(col("codes")))
      .withColumnRenamed("pos", "sub").withColumnRenamed("col", "code")
      .join(broadcast(qtable), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("nbr_id"))
      .agg(sum("qd2u").as("d2u"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("approx_d2", round(col("d2u") / 1000000.0d, 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2u").asc, col("nbr_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "approx_d2", "rank")
  }

  /** Two-stage search (the FAISS refine pattern, IndexRefineFlat): the
    * probe-limited ADC pass ranks `kCandidates` per query cheaply over
    * the compressed codes, then ONLY that candidate set — Q·kCandidates
    * id pairs, never the corpus — joins back to the full-precision
    * vectors for exact-cosine re-ranking. Compression error can still
    * cost RECALL (a true neighbor the ADC pass never surfaces stays
    * lost), but the returned order and scores are exact. The candidate
    * frame (with query vectors attached) broadcasts into the embedding
    * scan, so the refine stage adds no shuffle of the corpus. */
  def searchRefined(queries: DataFrame, embeddings: DataFrame,
                    nprobe: Int, kCandidates: Int, k: Int): DataFrame = {
    val cand = search(queries, nprobe, kCandidates)
      .select("query_id", "nbr_id")
    val q = queries.select(col("vec_id").as("query_id"),
      Similarity.asVec(queries).as("qvec"))
    val full = embeddings.select(col("vec_id").as("nbr_id"),
      Similarity.asVec(embeddings).as("nvec"))
    full.join(broadcast(cand.join(broadcast(q), Seq("query_id"))),
        Seq("nbr_id"))
      .withColumn("cosine", round(Vec.cosine(col("qvec"), col("nvec")), 4))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("nbr_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cosine", "rank")
  }
}

object IvfPqIndex {

  /** One corpus encode pass (the expensive part, paid once): coarse
    * assignment against the broadcast quantizer + PQ code assignment
    * against the broadcast codebook, packed to one row per vector. */
  def build(embeddings: DataFrame, nlist: Int, m: Int = 4,
            ksub: Int = 16): IvfPqIndex = {
    val e = embeddings.select(col("vec_id"),
      Similarity.asVec(embeddings).as("vec"))
    // one collected scrambled-id sample serves both broadcast sides
    // (same derivation as annIvfPq — prefix property keeps them equal)
    val sample = Similarity.collectedSample(e, math.max(nlist, ksub))
    val cents = sample.limit(nlist)
    val codebook = Similarity.pqCodebook(sample.limit(ksub), m)
    IvfPqIndex(cents, codebook, encode(embeddings, cents, codebook, m),
      nlist, m, ksub)
  }

  /** The corpus-sized encode pass, shared by [[build]] and
    * [[IvfPqIndex#append]]: ONE scan computing both the coarse
    * assignment and the PQ codes ([[Similarity.fusedEncode]] — the
    * unfused form read every vector twice and joined the halves on
    * vec_id), packed to one (vec_id, codes, cid) row per vector. */
  private def encode(embeddings: DataFrame, cents: DataFrame,
                     codebook: DataFrame, m: Int): DataFrame =
    Similarity.fusedEncode(
      embeddings.select(col("vec_id"),
        Similarity.asVec(embeddings).as("vec")),
      cents, codebook, m)

  /** Read an index written by [[IvfPqIndex#save]]: the base codes plus
    * every COMMITTED batch under `codes_batches/` (staged/crashed
    * batches are dot-prefixed and never listed — see
    * [[IvfPqIndex#appendBatchTo]]). The directory count is
    * metadata-sized (one per ingest batch), so the listing is a driver
    * FS call, not a data pass. */
  def load(spark: SparkSession, dir: String): IvfPqIndex = {
    val p = spark.read.parquet(s"$dir/params").head()
    val batchesRoot = new org.apache.hadoop.fs.Path(s"$dir/codes_batches")
    val fs = batchesRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchDirs =
      if (!fs.exists(batchesRoot)) Seq.empty[String]
      else fs.listStatus(batchesRoot).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_"))
        .map(_.getPath.toString).sorted
    val codes = batchDirs.foldLeft(spark.read.parquet(s"$dir/codes")) {
      (acc, b) => acc.unionByName(spark.read.parquet(b))
    }
    IvfPqIndex(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/codebook"),
      codes,
      p.getAs[Int]("nlist"), p.getAs[Int]("m"), p.getAs[Int]("ksub"))
  }
}

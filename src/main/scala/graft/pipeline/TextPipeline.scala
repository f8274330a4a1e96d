package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-cleaning operators for large-scale training-data pipelines:
  * dedup, quality scoring, language ID, fingerprinting, near-dup mining.
  *
  * All operators are shuffle-conscious: exact dedup is one hash aggregate;
  * near-dup mining joins on the shingle (inverted-index join) instead of a
  * doc×doc cartesian, so cost scales with shared-shingle pairs, not N².
  */
object TextPipeline {

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this")

  /** Exact dedup: canonical representative = min doc_id per identical text;
    * emits survivors with their duplicate count (A: hash groupBy — one
    * shuffle keyed by the text hash at scale, group key pruned early). */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
      .select("doc_id", "dup_count")

  /** Per-document analysis: token counts, punctuation ratio, stopword
    * ratio, quality score, fingerprint, heuristic language guess. */
  def docStats(docs: DataFrame, stopwords: Seq[String] = defaultStopwords): DataFrame =
    docs.select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.subwordCount(col("text")).as("n_subwords"),
      round(TextFunctions.punctRatio(col("text")), 6).as("punct_ratio"),
      round(TextFunctions.stopwordRatio(col("text"), stopwords), 6).as("stopword_ratio"),
      TextFunctions.qualityScore(col("text"), stopwords).as("quality"),
      TextFunctions.fingerprint(col("text")).as("fingerprint"))

  /** Near-duplicate pairs by word-shingle Jaccard ≥ `minJaccard`.
    * Inverted-index join: explode shingles → join on shingle → count
    * shared per pair → Jaccard from per-doc shingle-set sizes. Only pairs
    * that share ≥1 shingle are ever materialized. */
  def nearDupJaccard(docs: DataFrame, n: Int, minJaccard: Double): DataFrame = {
    val shingled = docs.select(col("doc_id"),
      array_distinct(TextFunctions.wordShingles(col("text"), n)).as("shingles"))
    val sizes = shingled.select(col("doc_id"), size(col("shingles")).as("n_shingles"))
    val inv = shingled.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val shared = inv.as("a").join(inv.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_shingles", "size_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_shingles", "size_b"), Seq("doc_b"))
      .withColumn("jaccard",
        round(col("shared").cast("double") /
          (col("size_a") + col("size_b") - col("shared")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "shared", "jaccard")
  }

  /** MinHash signatures: k portable hash functions (a_i·h + b_i mod p) over
    * the polynomial shingle hash; band into `bands` buckets for LSH
    * candidate generation. Candidate pairs share ≥1 (band, band-hash). */
  def minhashLsh(docs: DataFrame, n: Int, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rowsPerBand = k / bands
    val p = 140737488355213L
    val shingled = docs.select(col("doc_id"),
      array_distinct(TextFunctions.wordShingles(col("text"), n)).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val hashes = shingled.withColumn("hashes",
      transform(col("shingles"), s =>
        aggregate(
          transform(sequence(lit(1), length(s)), i => ascii(substr(s, i, lit(1))).cast("long")),
          lit(0L), (acc, c) => (acc * 31 + c) % p)))
    // k deterministic affine permutations; (2i+1) is odd → bijective-ish mod p
    val sig = hashes.withColumn("signature", array(
      (0 until k).map { i =>
        aggregate(col("hashes"), lit(Long.MaxValue),
          (m, h) => least(m, pmod(h * (2 * i + 1) + 31 * i + 7, lit(p))))
      }: _*))
    // band → bucket key
    sig.select(col("doc_id"), col("signature"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          concat_ws("_", b,
            hash(slice(col("signature"), b * rowsPerBand + 1, lit(rowsPerBand)))))))
      .withColumnRenamed("col", "bucket")
      .select("doc_id", "signature", "bucket")
  }

  /** LSH near-dup candidates: pairs sharing a band bucket, deduplicated. */
  def minhashCandidates(docs: DataFrame, n: Int = 3, k: Int = 16,
                        bands: Int = 4): DataFrame = {
    val buckets = minhashLsh(docs, n, k, bands).select("doc_id", "bucket")
    buckets.as("a").join(buckets.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** SimHash per document over whitespace tokens (64-bit-ish, 61 planes). */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0)
    docs.select(col("doc_id"),
      graft.functions.VectorFunctions.simhash64(toks).as("simhash"))
  }

  /** Heuristic language ID over the text column. */
  def langId(docs: DataFrame, profiles: Map[String, Seq[String]]): DataFrame =
    docs.select(col("doc_id"),
      TextFunctions.langIdHeuristic(col("text"), profiles).as("lang_guess"))
}

package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpus generator for scale-up smokes.
  *
  * The driver's testdata tops out at sf0.1 (5k documents / 2k embeddings —
  * TESTDATA.md), so super-linear degradation in the candidate-pair
  * operators (near-dup df-cap, banded-LSH bucket bounds) is invisible to
  * the per-round bench. This generator reproduces the testdata's corpus
  * statistics — 31-word vocabulary, 10–100 words/doc, 20 sources, the
  * 5-language mix, a small exact-duplicate and near-duplicate fraction,
  * 64-dim unit embeddings in 10 clusters — as pure Column arithmetic over
  * `spark.range`, so any scale materializes distributed (no driver-side
  * generation) and the same `(seed, id)` always yields the same row.
  *
  * Synthesis only (tools/specs); the oracle-checked queries always read
  * the driver's parquet. Statistics measured from
  * /root/testdata/sf0.1/documents.parquet.
  */
object DocSynth {

  /** The testdata's 31-word vocabulary (uniform draw reproduces its
    * near-uniform token frequencies). */
  val vocab: Seq[String] = Seq(
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch", "dup")

  private def h(parts: Column*): Column = xxhash64(parts: _*)

  /** One word draw: a head word from the 31-word vocabulary, suffixed
    * with a long-tail id for `tailPct`% of draws. The tail makes the
    * token/shingle document-frequency distribution realistic — a real
    * corpus has hot stop-words AND a long rare tail, and the df/bucket
    * skew guards are only meaningfully exercisable when rare shingles
    * exist to survive the caps (an all-stop-word corpus degenerates every
    * df-capped operator to an empty result). */
  private def word(seed: Column, i: Column, salt: Int,
                   tailPct: Int, tailSize: Int): Column = {
    val head = element_at(typedLit(vocab),
      (pmod(h(lit(salt), seed, i), lit(vocab.size)) + 1).cast("int"))
    if (tailPct <= 0) head
    else when(pmod(h(lit(salt + 100), seed, i), lit(100L)) < tailPct,
        concat(head, lit("-"),
          pmod(h(lit(salt + 200), seed, i), lit(tailSize.toLong))))
      .otherwise(head)
  }

  /** `nDocs` documents with the testdata schema
    * (doc_id, text, lang, source, n_chars).
    *
    * `dupPpm` of documents copy the previous document's text verbatim
    * (exact-dedup fodder); `nearDupPpm` copy it with the last two words
    * rewritten (high-Jaccard / low-Hamming near-dup fodder). Both are
    * id-hash gated, so the fractions hold at any scale and the data is
    * identical for identical (nDocs, seed). */
  def documents(spark: SparkSession, nDocs: Long, seed: Long = 42L,
                dupPpm: Long = 1600L, nearDupPpm: Long = 1600L,
                nSources: Int = 20, tailPct: Int = 40,
                tailSize: Int = 4000,
                wordsMin: Int = 10, wordsMax: Int = 100): DataFrame = {
    require(wordsMin >= 3 && wordsMax >= wordsMin, "wordsMin >= 3 <= wordsMax")
    val id = col("id")
    val gate = pmod(h(lit(seed), lit("kind"), id), lit(1000000L))
    val isDup = id > 0 && gate < dupPpm
    val isNear = id > 0 && !isDup && gate < dupPpm + nearDupPpm
    // text content derives from `src`: the previous id for (near-)dups
    val src = when(isDup || isNear, id - 1).otherwise(id)
    // long-form knob (wordsMin/wordsMax): defaults reproduce the
    // historical 10–100-word short-form corpus byte-for-byte; the
    // long-document smokes raise it to production text lengths (~20 KB)
    val nWords = (lit(wordsMin) + pmod(h(lit(seed), lit("len"), src),
      lit((wordsMax - wordsMin + 1).toLong))).cast("int")
    val base = transform(sequence(lit(0), nWords - 1),
      i => word(h(lit(seed), src), i, 1, tailPct, tailSize))
    // near-dup: rewrite the last two words from the OWN id's hash stream
    val words = when(isNear,
        concat(slice(base, lit(1), nWords - 2),
          transform(sequence(lit(0), lit(1)),
            i => word(h(lit(seed), id), i, 2, tailPct, tailSize))))
      .otherwise(base)
    val langP = pmod(h(lit(seed), lit("lang"), id), lit(1000L))
    spark.range(nDocs).select(
      id.as("doc_id"),
      array_join(words, " ").as("text"),
      when(langP < 412, "en").when(langP < 562, "zh").when(langP < 711, "es")
        .when(langP < 860, "fr").otherwise("de").as("lang"),
      concat(lit("src"),
        pmod(h(lit(seed), lit("srcn"), id), lit(nSources.toLong))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** [[documents]] with one MEGA near-duplicate class injected: `megaPpm`
    * of documents (default 10%) share a single ~60-word boilerplate
    * template, each mutated in its last word only — the classic web-corpus
    * incident shape (site chrome, cookie banners, licence blocks) that
    * [[documents]]' benign tens-of-docs duplicate families never produce.
    * Members are mutual near-dups under every scheme at once: ~97%
    * 2-shingle Jaccard, ≤ a few bits of simhash Hamming, edit distance =
    * one word. At n=500k that is ONE 50k-member class: all-pairs
    * candidate generation owes 1.25 B pairs from this family alone, so
    * the corpus exists to prove the caps/tiling/star-edge paths bound
    * the work while the benign twin (same seed, same everything else)
    * provides the ≤ ~linear comparison cell. Same schema, same id-hash
    * gating — deterministic in (nDocs, seed), supersets across scales. */
  def documentsSkewed(spark: SparkSession, nDocs: Long, seed: Long = 42L,
                      megaPpm: Long = 100000L, nSources: Int = 20,
                      tailPct: Int = 40, tailSize: Int = 4000): DataFrame = {
    val base = documents(spark, nDocs, seed, nSources = nSources,
      tailPct = tailPct, tailSize = tailSize)
    val id = col("doc_id")
    val isMega = pmod(h(lit(seed), lit("mega"), id), lit(1000000L)) < megaPpm
    // the shared stream: word draws keyed on a CONSTANT, so every mega
    // doc deals the same 59 boilerplate words
    val boiler = transform(sequence(lit(0), lit(58)),
      i => word(h(lit(seed), lit(-1L)), i, 4, tailPct, tailSize))
    // the per-doc mutation: one trailing word from the doc's own hash
    // stream, forced into the long tail so it is (almost surely) unique
    val mut = array(word(h(lit(seed), id), lit(0), 5, 100, 1 << 30))
    base.withColumn("text",
        when(isMega, array_join(concat(boiler, mut), " "))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** `nVecs` unit-norm `dims`-dim float embeddings in `nLabels` clusters
    * (testdata schema: vec_id, embedding, label). Each vector is its
    * label's centroid plus 0.3-amplitude noise, renormalized — clustered
    * enough that IVF/PQ partitions meaningfully, noisy enough that
    * neighbor sets are non-trivial. */
  def embeddings(spark: SparkSession, nVecs: Long, seed: Long = 42L,
                 dims: Int = 64, nLabels: Int = 10): DataFrame = {
    val id = col("id")
    val label = pmod(h(lit(seed), lit("lbl"), id), lit(nLabels.toLong)).cast("int")
    def unit(salt: String, k: Column, d: Column): Column =
      (pmod(h(lit(seed), lit(salt), k, d), lit(2001L)) - 1000L) / 1000.0d
    val raw = transform(sequence(lit(0), lit(dims - 1)),
      d => unit("cent", label, d) + unit("noise", id, d) * 0.3d)
    val norm = sqrt(aggregate(raw, lit(0.0d), (acc, x) => acc + x * x))
    spark.range(nVecs).select(
      id.as("vec_id"),
      transform(raw, x => (x / norm).cast("float")).as("embedding"),
      label.as("label"))
  }

  /** [[embeddings]]' adversarial-skew twin: `megaPpm` of vectors (10%
    * default) collapse into ONE degenerate vector — the same content
    * embedded over and over, the embedding-tier analogue of
    * [[documentsSkewed]]'s boilerplate class. The members are mutual
    * duplicates under EVERY embedding scheme at once: pairwise cosine
    * exactly 1, identical sign bits on every LSH hyperplane (one band
    * bucket), one nearest coarse centroid (one inverted list holding
    * 10% of the corpus — EXACT identity matters here: the IVF quantizer
    * samples the corpus, so a merely-near-identical class would split
    * across the ~megaPpm·nlist sampled mega centroids into sub-cap
    * slivers and exercise no guard, while identical vectors tie on
    * every assignment and land together deterministically).
    * `megaNoise > 0` restores the near-dup variant for spec use. At
    * n=1M the class owes ~5·10⁹ within-cluster pairs, so the corpus
    * exists to prove the maxCluster / maxBucket / probe-limited paths
    * bound the work while the benign twin provides the ≤ ~linear
    * comparison cell. Same schema and id-hash gating — deterministic
    * in (nVecs, seed), supersets across scales. */
  def embeddingsSkewed(spark: SparkSession, nVecs: Long, seed: Long = 42L,
                       dims: Int = 64, nLabels: Int = 10,
                       megaPpm: Long = 100000L,
                       megaNoise: Double = 0.0d): DataFrame = {
    val id = col("vec_id")
    val isMega = pmod(h(lit(seed), lit("megav"), id), lit(1000000L)) < megaPpm
    def unit(salt: String, k: Column, d: Column): Column =
      (pmod(h(lit(seed), lit(salt), k, d), lit(2001L)) - 1000L) / 1000.0d
    val raw = transform(sequence(lit(0), lit(dims - 1)),
      d => unit("megac", lit(0L), d) +
        (if (megaNoise == 0.0d) lit(0.0d)
         else unit("meganz", id, d) * megaNoise))
    val norm = sqrt(aggregate(raw, lit(0.0d), (acc, x) => acc + x * x))
    val mega = transform(raw, x => (x / norm).cast("float"))
    embeddings(spark, nVecs, seed, dims, nLabels)
      .withColumn("embedding", when(isMega, mega).otherwise(col("embedding")))
  }
}

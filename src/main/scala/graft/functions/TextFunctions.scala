package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for large-scale corpus pipelines + reference X10/X11.
  *
  * Everything is built-in `Column` composites (higher-order array functions)
  * — codegen-compatible, no UDFs, and each has a portable-SQL twin used by
  * the DuckDB oracles in SparkEntry.
  */
object TextFunctions {

  /** Shannon entropy (bits/char) of a string — reference
    * element_entropy.py:30-40. O(distinct·len) via array ops; fine for
    * short keys (domains); for long documents prefer [[tokenEntropy]]. */
  def charEntropy(s: Column): Column = {
    val chars = split(s, "")
    val n = size(chars).cast("double")
    // sorted distinct chars: pins the floating-point summation order so
    // independent implementations (the DuckDB oracle) get identical bits
    val counts = transform(array_sort(array_distinct(chars)),
      c => size(filter(chars, x => x === c)).cast("double"))
    -aggregate(counts, lit(0.0d), (acc, c) => acc + (c / n) * log2(c / n))
  }

  /** Whitespace token count. */
  def tokenCount(s: Column): Column =
    when(length(trim(s)) === 0, 0).otherwise(size(split(trim(s), "\\s+")))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-alphanumeric-non-space chars (crude GPT-style pretokenizer). */
  def subwordCount(s: Column): Column =
    size(regexp_extract_all(s, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of punctuation chars to total (0 for empty). */
  def punctRatio(s: Column): Column =
    when(length(s) === 0, 0.0d).otherwise(
      size(regexp_extract_all(s, lit("[!-/:-@\\[-`{-~]"), lit(0))).cast("double")
        / length(s))

  /** Fraction of whitespace tokens that are in `stopwords`. */
  def stopwordRatio(s: Column, stopwords: Seq[String]): Column = {
    val toks = filter(split(lower(trim(s)), "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, 0.0d).otherwise(
      size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("double")
        / size(toks))
  }

  /** Composite document quality score in [0,1]: length band + low punct +
    * some stopwords (heuristic quality filter for corpus cleaning). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore  = least(length(text).cast("double") / 500.0d, lit(1.0d))
    val punctPen  = greatest(lit(0.0d), lit(1.0d) - punctRatio(text) * 5.0d)
    val stopScore = least(stopwordRatio(text, stopwords) * 4.0d, lit(1.0d))
    round((lenScore + punctPen + stopScore) / 3.0d, 6)
  }

  /** Deterministic 47-bit polynomial rolling-hash fingerprint of a string:
    * h = Σ h*31 + code(c), mod 2^47-115. Portable: same arithmetic is
    * expressible in ANSI SQL (list_reduce in DuckDB) for oracle checks. */
  def fingerprint(s: Column): Column = {
    val mod = 140737488355213L // 2^47 - 115 (prime); *31 stays within Long
    aggregate(
      transform(sequence(lit(1), length(s)), i => ascii(substr(s, i, lit(1))).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31 + c) % mod)
  }

  /** Word n-gram shingles (space-joined) of a document. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Simple n-gram language-ID heuristic: pick the language whose stopword
    * list hits the most tokens; ties → lexicographically first language. */
  def langIdHeuristic(text: Column, profiles: Map[String, Seq[String]]): Column = {
    val toks = filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words.map(lit): _*))).as("hits"),
             lit(lang).as("lang"))
    }
    // max by (hits, then reverse-alphabetical lang loses): sort desc on hits,
    // asc on lang via struct compare with negated hits
    element_at(
      sort_array(array(scored.map(s0 =>
        struct((-s0.getField("hits")).as("neg"), s0.getField("lang").as("lang"))): _*)),
      1).getField("lang")
  }
}

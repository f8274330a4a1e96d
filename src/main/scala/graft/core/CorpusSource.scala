package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Document-corpus ingestion beyond the parquet tables: JSONL dumps (the
  * Common-Crawl / RefinedWeb / Dolma interchange format — one JSON object
  * per line, possibly .gz, schema drifting across dumps) normalized to
  * the engine's (doc_id, text, source) contract.
  *
  * Robustness posture for a 100 TB crawl dump:
  *  - the line is parsed with an EXPLICIT schema (`from_json` over
  *    `text` input — codegen'd, no sampling pass over the corpus the way
  *    `spark.read.json` schema inference does: inference is a full extra
  *    scan AND nondeterministic under drift);
  *  - malformed lines (truncated JSON, wrong types) never kill the job
  *    and never silently vanish: [[readJsonl]] returns good rows,
  *    [[quarantine]] the rejects with the raw line preserved for replay
  *    — both from ONE parse expression, so the split is exact;
  *  - missing ids get deterministic content-derived ones (47-bit
  *    fingerprint of source‖text — stable across re-reads and engines,
  *    unlike `monotonically_increasing_id` which depends on partition
  *    layout).
  *
  * Gzip/zstd-compressed files work unchanged (Hadoop codecs decide by
  * extension); compressed text files are NOT splittable, so a 100 TB
  * dump should arrive as many shard files — the standard crawl layout —
  * rather than one giant archive.
  */
object CorpusSource {

  /** The JSONL field schema accepted from dumps: id optional, text
    * required, source optional. Extra fields in the line are ignored by
    * `from_json` (schema projection — they are never even materialized). */
  val jsonlSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  private def parsed(spark: SparkSession, path: String): DataFrame =
    spark.read.format("text").load(path)
      .select(col("value").as("raw"),
        from_json(col("value"), jsonlSchema).as("j"))

  /** A derived doc_id when the dump carries none: the portable 47-bit
    * fingerprint of source‖text. Content-addressed, so identical docs
    * collide on purpose (exact dedup gets them) and re-reads are stable. */
  private def derivedId(source: Column, text: Column): Column =
    graft.expressions.TextExpressions.polyHash47(
      array(concat_ws("", coalesce(source, lit("")), text)))
      .getItem(0)

  /** Well-formed documents from a JSONL path: (doc_id, text, source).
    * A line is well-formed when it parses AND carries a non-null,
    * non-empty text field. `defaultSource` stamps dumps without a
    * source field (typically the dump name). */
  def readJsonl(spark: SparkSession, path: String,
                defaultSource: String = "jsonl"): DataFrame =
    parsed(spark, path)
      .filter(col("j").isNotNull && col("j.text").isNotNull &&
        length(col("j.text")) > 0)
      .select(
        coalesce(col("j.id"),
          derivedId(col("j.source"), col("j.text"))).as("doc_id"),
        col("j.text").as("text"),
        coalesce(col("j.source"), lit(defaultSource)).as("source"))

  /** The rejects of [[readJsonl]] with the raw line preserved:
    * unparseable JSON or a missing/empty text field. Write this next to
    * the ingested output — a crawl pipeline that drops rejects silently
    * cannot be audited. The reason column is coarse on purpose (two
    * classes cover every reject; finer taxonomy belongs downstream).
    * PERMISSIVE `from_json` yields an all-null STRUCT for malformed
    * lines (never a null struct, and it refuses a corrupt-record column
    * in its schema), so JSON validity is probed with the native
    * `try_parse_json` (variant) instead. */
  def quarantine(spark: SparkSession, path: String): DataFrame =
    parsed(spark, path)
      .filter(col("j").isNull || col("j.text").isNull ||
        length(col("j.text")) === 0)
      .select(col("raw"),
        when(try_parse_json(col("raw")).isNull, lit("malformed_json"))
          .otherwise(lit("missing_text")).as("reason"))
}

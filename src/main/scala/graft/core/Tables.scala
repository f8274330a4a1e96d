package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All tables live under a scale-factor directory, one parquet file per
  * table: region nation customer supplier part orders lineitem events
  * documents embeddings.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet footer schemas memoized per path: `spark.read.parquet`
    * without an explicit schema launches a one-task footer-inference
    * JOB on every call — a fixed ~40 ms scheduling round that lands on
    * every registered query. The testdata files are immutable for a
    * session, so infer once and pass `.schema(...)` thereafter.
    * (`spark.sql.legacy.parquet.nanosAsLong` changes what the footer
    * infers — it is set by Graft.tune before any load here, and the
    * key includes the session's setting to stay correct if a session
    * ever flips it.) */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val key = path + "#" +
      spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    val schema = schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events` with `ts` normalized to the engine contract: epoch-NANOS
    * LongType. The driver's testdata has shipped this column both as
    * parquet TIMESTAMP(NANOS) (readable only as long, via the
    * `nanosAsLong` conf set in [[Graft.tune]]) and as `timestamp[us]`
    * (Spark: TIMESTAMP / TIMESTAMP_NTZ); every downstream consumer
    * (`FlowSynth`, `ts div 1000000` call sites) assumes int64 nanos, so
    * dispatch on the read schema here — one place — instead of per query.
    * NTZ wall-clock values are interpreted as UTC (session tz is pinned
    * to UTC by [[Graft.tune]]), matching the DuckDB oracle's
    * `epoch_ms(ts)` which also treats naive timestamps as UTC. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.withColumn("ts", normalizeTsNanos(raw.schema("ts").dataType))
  }

  /** ts (of the given read dtype) → epoch-nanos LongType column. */
  private[graft] def normalizeTsNanos(dt: DataType) = dt match {
    case LongType => col("ts") // already epoch-nanos (nanosAsLong read)
    case TimestampNTZType =>
      // NTZ wall-clock is defined as UTC by the testdata contract. The
      // cast's zone is PINNED to UTC at the expression (Cast.timeZoneId)
      // instead of relying on spark.sql.session.timeZone: a session built
      // without Graft.tune on a non-UTC machine must not silently shift
      // every flow window by the local offset.
      import org.apache.spark.sql.catalyst.expressions.Cast
      import org.apache.spark.sql.graftbridge.ColumnBridge
      unix_micros(ColumnBridge.column(Cast(
        ColumnBridge.expression(col("ts")), TimestampType, Some("UTC")))) * 1000L
    case _: TimestampType =>
      unix_micros(col("ts")) * 1000L // instant-typed: tz-independent
    case other => throw new IllegalArgumentException(
      s"events.ts: unsupported parquet-read type $other " +
        "(expected LongType nanos or a timestamp type)")
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

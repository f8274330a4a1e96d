package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults. */
object Graft {

  /** Apply engine defaults to an existing session (runtime-settable confs
    * only — safe to call on a driver-provided session). */
  def tune(spark: SparkSession): SparkSession = {
    val c = spark.conf
    // events.ts is parquet TIMESTAMP(NANOS): Spark 4 only reads it as long.
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // AQE coalescing targets max(total/parallelism, minPartitionSize) —
    // with the 1 MB default, a CPU-heavy but byte-small shuffle (gram
    // fingerprints, digests, simhash keys: ~8 B/row) collapses to 1-2
    // reduce tasks on a 32-core box while the cores idle. 64 KB keeps
    // such stages at full parallelism; at real scale shuffles are
    // GB-sized and total/parallelism dominates, so this floor never
    // binds there.
    c.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    c.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  /** Opt into the RocksDB state store for streaming state. The default
    * HDFS-backed provider keeps every version of every key on the executor
    * HEAP — at 100 TB-scale key spaces (per-host profiles, corpus-wide
    * streaming dedup keys) that is an OOM, not a tuning problem. RocksDB
    * holds state off-heap + on local disk, and changelog checkpointing
    * ships per-batch deltas instead of full SST snapshots. Runtime-settable;
    * applies to queries STARTED after this call. */
  def useRocksDbState(spark: SparkSession, changelog: Boolean = true): SparkSession = {
    val c = spark.conf
    c.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    c.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      changelog.toString)
    spark
  }

  def session(appName: String = "graft", master: String = "local[*]",
              shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tune(spark)
  }
}

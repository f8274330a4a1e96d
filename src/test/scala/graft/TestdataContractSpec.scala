package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** The engine ↔ driver-testdata ingestion contract, pinned.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed column encodings silently (events.ts: parquet TIMESTAMP(NANOS)
  * → timestamp[us] in round 10, which killed every flow query at Verify
  * time instead of one obvious spec). This spec is the tripwire: it reads
  * each table at sf0.001 and asserts exactly the engine-facing schema the
  * operators assume, so the NEXT regeneration fails here with a message
  * naming the table and column.
  */
class TestdataContractSpec extends SparkSpec {

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  private def assertCols(table: String, expected: (String, DataType)*): Unit = {
    val schema = Tables.load(spark, sfDir, table).schema
    expected.foreach { case (name, dt) =>
      val field = schema.find(_.name == name)
      assert(field.isDefined, s"$table: missing column '$name' " +
        s"(testdata regenerated with a new schema? got ${schema.simpleString})")
      assert(field.get.dataType == dt,
        s"$table.$name: expected $dt, testdata now has ${field.get.dataType} " +
          "— update graft.core.Tables normalization, not every query")
    }
  }

  test("TPC-H-ish tables carry the joined/aggregated columns at pinned types") {
    assertCols("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertCols("nation", "n_nationkey" -> IntegerType,
      "n_regionkey" -> IntegerType, "n_name" -> StringType)
    assertCols("customer", "c_custkey" -> LongType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType)
    assertCols("supplier", "s_suppkey" -> LongType,
      "s_nationkey" -> IntegerType)
    assertCols("part", "p_partkey" -> LongType, "p_type" -> StringType,
      "p_retailprice" -> DoubleType)
    assertCols("orders", "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType)
    assertCols("lineitem", "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType)
  }

  test("documents / embeddings: the LLM-pipeline tier's input contract") {
    assertCols("documents", "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType)
    assertCols("embeddings", "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  }

  test("documents.text is ASCII: byte/char-level hash oracle parity depends on it") {
    // Two oracle-parity contracts ride this: (a) the winnow /
    // fingerprint twins compute per-char poly-47 hashes as DuckDB
    // `ascii(substr(...))` vs the engine's UTF-16 charAt — identical
    // for BMP text; (b) q_media_cdc* chunk the BINARY media column in
    // BYTE units while the SQL twin chunks `text` in code-point units —
    // identical only for ASCII (any multi-byte UTF-8 char shifts byte
    // offsets off code-point offsets). ASCII subsumes BMP, so assert
    // the stronger contract: if a testdata regeneration introduces
    // non-ASCII text, THIS spec fails with a message instead of N query
    // hash mismatches at Verify time.
    import org.apache.spark.sql.functions._
    val nonAscii = Tables.documents(spark, sfDir)
      .filter(col("text").rlike("[^\\x00-\\x7F]"))
      .count()
    assert(nonAscii == 0L,
      s"$nonAscii documents contain non-ASCII characters; byte-unit " +
        "(q_media_cdc*) and char-unit (winnow/fingerprint) oracle parity breaks")
  }

  test("events: Tables.events normalizes ts to epoch-nanos LongType on the current encoding") {
    assertCols("events", "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType)
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == LongType,
      s"events.ts after Tables normalization must be epoch-nanos LongType, " +
        s"got ${ev.schema("ts").dataType} — extend Tables.normalizeTsNanos")
    // ts_ms derivable and in a sane epoch window (2000..2100): a driver
    // re-encode to epoch-SECONDS or -MILLIS longs would pass the type
    // check but land outside this window, failing here with the value.
    val Array(lo, hi) = ev
      .agg(min(expr("ts div 1000000")), max(expr("ts div 1000000")))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val y2000 = 946684800000L
    val y2100 = 4102444800000L
    assert(lo >= y2000 && hi < y2100,
      s"events ts_ms range [$lo, $hi] outside 2000..2100 — ts encoding " +
        "changed (seconds? millis?); fix Tables.normalizeTsNanos")
  }

  test("events: NTZ normalization is pinned to UTC, independent of session tz") {
    // A session built WITHOUT Graft.tune on a non-UTC machine must read
    // identical nanos — the Cast's zone is pinned at the expression, so a
    // stray session.timeZone cannot silently shift every flow window.
    val key = "spark.sql.session.timeZone"
    val saved = spark.conf.get(key)
    val utc = Tables.events(spark, sfDir)
      .agg(min("ts"), max("ts")).collect().head.toSeq
    try {
      spark.conf.set(key, "America/New_York")
      val shifted = Tables.events(spark, sfDir)
        .agg(min("ts"), max("ts")).collect().head.toSeq
      assert(shifted == utc,
        s"events.ts nanos drift with session tz: $shifted vs $utc")
    } finally spark.conf.set(key, saved)
  }

  test("events: normalization preserves column pruning and filter pushdown") {
    // The ts projection must not widen the parquet scan or block
    // predicate pushdown — at 100 TB the scan IS the query cost.
    val q = Tables.events(spark, sfDir)
      .select("ts", "event_type")
      .filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.toString
    val read = scan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail("no parquet scan in the events plan"))
    assert(read.contains("ts") && read.contains("event_type") &&
      !read.contains("user_id") && !read.contains("props"),
      s"events scan reads more than the projected columns: $read")
    assert(scan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]")
        || scan.linesIterator.exists(l =>
             l.contains("PushedFilters") && l.contains("EqualTo(event_type,click)")),
      "event_type filter did not reach the parquet scan")
  }

  test("events: an unsupported ts encoding fails loudly at read, not per query") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("badts").toString
    Seq((1L, "2024-01-01", 2L, "click", 0.5, null: String))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events.ts"))
  }
}

package graft

import graft.tools.OracleLint

/** Canonicalization gate for the DuckDB oracle corpus: the driver's
  * compare hashes serialized dtypes, so an oracle whose output carries
  * HUGEINT (uncast integer `sum`) or DECIMAL (bare decimal literal)
  * hash-mismatches even when every value is right — the r12
  * q_host_rank / q_media_cdc_stats / q_quality_checks class. The
  * authoritative probe is driver-side (`scripts/check.py` DESCRIBEs
  * every oracle in DuckDB and rejects HUGEINT/DECIMAL columns, and
  * sweeps result doubles for -0.0); this spec is the hermetic layer
  * that keeps `sbt test` red the moment an uncanonicalized oracle is
  * registered. */
class OracleCanonSpec extends SparkSpec {

  test("lint fires on a deliberately uncast sum") {
    assert(OracleLint.findings(
      "SELECT k, sum(x) AS s FROM t GROUP BY k").exists(_.startsWith("uncast-sum")))
    assert(OracleLint.findings(
      "SELECT sum(a) - sum(b) AS d FROM t").size == 2)
  }

  test("lint fires on a bare decimal-literal alias") {
    assert(OracleLint.findings("SELECT 'size' AS chk, 100.0 AS lo FROM t")
      .exists(_.startsWith("decimal-literal-alias")))
  }

  test("lint passes the canonical forms") {
    for (ok <- Seq(
      "SELECT CAST(sum(x) AS BIGINT) AS s FROM t",
      "SELECT round(sum(x) / CAST(sum(y) AS DOUBLE), 4) AS r FROM t",
      "SELECT round(avg(x), 6) AS a FROM t",
      "SELECT sum(x) / count(*) AS m FROM t",      // / is float division
      "SELECT sum(x)::BIGINT AS s FROM t",
      "SELECT n / sum(x) AS frac FROM t",          // denominator side
      "SELECT CAST(100.0 AS DOUBLE) AS lo FROM t",
      "SELECT round(x, 6) + 0.0 AS cov FROM t"))   // -0.0 normalizer
      assert(OracleLint.findings(ok).isEmpty, s"false positive on: $ok")
  }

  test("every registered oracle is canonical under the static rules") {
    val dir = "/root/testdata/sf0.001"
    val all = SparkEntry.oracleSql ++ SparkEntry.dataOracles(spark, dir)
    val bad = all.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      OracleLint.findings(sql).map(f => s"$name: $f")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}

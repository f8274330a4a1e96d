package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the bench record's two shapes (Bench.renderLines).
  *
  * The round driver keeps only the LAST ~2000 chars of bench stdout:
  * BENCH_r12–r14 all carry `"parsed": null` because the single output
  * line (four 38-entry maps at full double precision) outgrew that
  * window. The contract line must therefore (a) stay parseable JSON
  * with the driver-contract fields, and (b) fit the window with margin
  * at the real headline-set size — that bound is asserted here against
  * the ACTUAL registered headline set, so growing the set past the
  * window breaks CI instead of silently breaking the driver's parse.
  */
class BenchRenderSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper

  private def fakeResults(names: Seq[String])
      : Seq[(String, Double, Double, Option[String])] =
    names.zipWithIndex.map { case (n, i) =>
      // worst-case-width seconds: hundreds place + irrational tail
      (n, 100.0 + i + math.Pi / 7, 100.0 + i, None)
    }

  test("contract line fits the driver's tail window on the real headline set") {
    val names = SparkEntry.benchQueries
    assert(names.nonEmpty)
    val duck = Some(names.map(n => n -> 123.456789).toMap)
    // weather instruments ON (the production configuration) so the
    // length bound is asserted against the line the driver actually sees
    val (compact, detail) =
      Bench.renderLines(fakeResults(names), duck, warm = true,
        timedPasses = 2, sfDir = "/root/testdata/sf0.1",
        gc = names.map(n => n -> 12.345678).toMap,
        calib = Some((123.456789, 123.456789)),
        duckMin = names.map(n => n -> 111.111111).toMap, duckPasses = 3)
    // sbt appends "[success] Total time: ..." (~75 chars) inside the
    // same 2000-char window; 1800 leaves that margin plus slack
    assert(compact.length <= 1800,
      s"contract line ${compact.length} chars > 1800: the driver's " +
        "2000-char tail would truncate it back to parsed=null")
    val c = mapper.readTree(compact)
    assert(c.get("metric").asText == "total")
    assert(c.get("unit").asText == "sec")
    assert(c.get("queries").size == names.size)
    assert(c.get("value").isNumber)
    assert(c.get("duck_total").isNumber)
    assert(c.get("ratio_total").isNumber)
    // weather-normalized ratio line: min-of-passes on BOTH engines, with
    // the comparator's pass count stated in the artifact (r17 task 2)
    assert(c.get("duck_min_total").isNumber)
    assert(c.get("ratio_norm").isNumber)
    assert(c.get("duck_passes").asInt == 3)
    assert(c.get("sf").asText == "/root/testdata/sf0.1")
    val d = mapper.readTree(detail)
    assert(d.get("queries").size == names.size)
    assert(d.get("queries_min").size == names.size)
    assert(d.get("duck").size == names.size)
    assert(d.get("ratio").size == names.size)
    assert(d.get("duck_min").size == names.size)
    assert(d.get("ratio_norm_q").size == names.size)
    assert(d.get("ratio_norm").isNumber && d.get("duck_passes").asInt == 3)
    // weather instruments: scalars in BOTH shapes, per-query gc map in
    // the detail shape only (the contract line must stay scalar-sized)
    assert(c.get("calib_sec").isNumber && c.get("calib_end_sec").isNumber)
    assert(c.get("gc_total_sec").isNumber)
    assert(c.get("queries_gc") == null)
    assert(d.get("queries_gc").size == names.size)
    assert(d.get("calib_sec").asDouble == 123.457)
  }

  test("weather fields: absent when not instrumented, -1 gc on failed rows") {
    val rs = Seq(
      ("ok_q", 1.0, 1.0, None),
      ("bad_q", 9.9, 9.9, Some("IllegalStateException")))
    val (plain, plainDetail) = Bench.renderLines(
      rs, None, warm = false, timedPasses = 1, sfDir = "x")
    assert(mapper.readTree(plain).get("calib_sec") == null)
    assert(mapper.readTree(plain).get("gc_total_sec") == null)
    assert(mapper.readTree(plainDetail).get("queries_gc") == null)
    val (compact, detail) = Bench.renderLines(
      rs, None, warm = false, timedPasses = 1, sfDir = "x",
      gc = Map("ok_q" -> 0.25, "bad_q" -> 3.0), calib = Some((0.31, 0.29)))
    val c = mapper.readTree(compact)
    assert(c.get("calib_sec").asDouble == 0.31)
    assert(c.get("calib_end_sec").asDouble == 0.29)
    // gc_total_sec sums SUCCESSFUL rows only (a failed row's window
    // times time-to-exception, not the query)
    assert(c.get("gc_total_sec").asDouble == 0.25)
    val d = mapper.readTree(detail)
    assert(d.get("queries_gc").get("ok_q").asDouble == 0.25)
    assert(d.get("queries_gc").get("bad_q").asDouble == -1.0)
  }

  test("calibration kernel returns a plausible single-core wall") {
    val s = Bench.calibrate()
    // fixed work: sub-millisecond would mean DCE'd, minutes would mean
    // the kernel is mis-sized for a bench prologue
    assert(s > 0.001 && s < 60.0, s"calibrate() = $s s")
  }

  test("detail pointer names the path actually written") {
    val (compact, _) =
      Bench.renderLines(fakeResults(Seq("q")), None, warm = false,
        timedPasses = 1, sfDir = "x", detailPath = "/artifacts/bd.json")
    assert(mapper.readTree(compact).get("detail").asText
      == "/artifacts/bd.json")
  }

  test("detail pointer reads null when the detail file was not written") {
    val (compact, _) =
      Bench.renderLines(fakeResults(Seq("q")), None, warm = false,
        timedPasses = 1, sfDir = "x", detailPath = "")
    assert(mapper.readTree(compact).get("detail").isNull)
  }

  test("quote/backslash/newline-bearing error text stays parseable JSON") {
    val rs = Seq(("bad_q", 9.9, 9.9,
      Some("boom \"quoted\" back\\slash\nand a newline")))
    val (compact, detail) = Bench.renderLines(
      rs, None, warm = false, timedPasses = 1, sfDir = "x")
    // one-line stdout contract: control chars become spaces, never \n
    assert(!compact.contains("\n") && !detail.contains("\n"))
    val c = mapper.readTree(compact)
    assert(c.get("errors").get(0).asText
      == "bad_q:boom \"quoted\" back\\slash and a newline")
    assert(mapper.readTree(detail).get("errors").get(0).asText
      == c.get("errors").get(0).asText)
  }

  test("failed query reads -1 in every map and is listed under errors") {
    val rs = Seq(
      ("ok_q", 1.23456, 1.2, None),
      ("bad_q", 9.9, 9.9, Some("IllegalStateException")))
    val (compact, detail) = Bench.renderLines(
      rs, Some(Map("ok_q" -> 2.0)), warm = false, timedPasses = 2, sfDir = "x")
    val c = mapper.readTree(compact)
    assert(c.get("queries").get("bad_q").asDouble == -1.0)
    assert(c.get("queries").get("ok_q").asDouble == 1.235) // 3-decimal round
    assert(c.get("errors").get(0).asText == "bad_q:IllegalStateException")
    assert(c.get("warmup_passes").asInt == 0)
    // total and the duck summary exclude the failed row
    assert(c.get("value").asDouble == 1.235)
    assert(c.get("ratio_total").asDouble == 0.617)
    val d = mapper.readTree(detail)
    assert(d.get("queries_min").get("bad_q").asDouble == -1.0)
    assert(d.get("ratio").get("bad_q").isNull)
    assert(d.get("duck").get("bad_q").isNull)
  }

  test("no comparator: duck fields absent, line still parses") {
    val (compact, detail) = Bench.renderLines(
      fakeResults(Seq("a", "b")), None, warm = true, timedPasses = 1, "x")
    val c = mapper.readTree(compact)
    assert(c.get("duck_total") == null)
    assert(c.get("ratio_total") == null)
    assert(c.get("duck_min_total") == null)
    assert(c.get("ratio_norm") == null)
    assert(c.get("queries").size == 2)
    assert(mapper.readTree(detail).get("duck") == null)
    assert(mapper.readTree(detail).get("duck_min") == null)
  }

  test("ratio_norm is min/min and excludes failed and un-timed rows") {
    val rs = Seq(
      ("a", 2.0, 1.0, None),   // min 1.0, duckMin 0.5 → 2.0
      ("b", 3.0, 2.0, None),   // no duckMin row → excluded
      ("bad", 9.9, 9.9, Some("X"))) // failed → excluded
    val (compact, detail) = Bench.renderLines(
      rs, Some(Map("a" -> 1.0)), warm = false, timedPasses = 2, sfDir = "x",
      duckMin = Map("a" -> 0.5, "bad" -> 1.0), duckPasses = 3)
    val c = mapper.readTree(compact)
    assert(c.get("duck_min_total").asDouble == 0.5)
    assert(c.get("ratio_norm").asDouble == 2.0)
    assert(c.get("duck_passes").asInt == 3)
    val d = mapper.readTree(detail)
    assert(d.get("ratio_norm_q").get("a").asDouble == 2.0)
    assert(d.get("ratio_norm_q").get("b").isNull)
    assert(d.get("ratio_norm_q").get("bad").isNull)
    assert(d.get("duck_min").get("a").asDouble == 0.5)
  }
}

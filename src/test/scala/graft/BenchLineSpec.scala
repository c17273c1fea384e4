package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench output line under the driver's capture window.
  *
  * The driver keeps only the LAST 2000 characters of sbt output and parses
  * the metric JSON out of that tail; sbt appends its own `[success] Total
  * time: ...` line (~70 chars) after our println. Rounds 1-3 overflowed the
  * window (BENCH_r0{1,2,3}.json all record `"parsed": null`), so the line
  * is now compacted and this spec fails the build if the full declared
  * query list — at pessimistic 5-char timings — would overflow again.
  */
class BenchLineSpec extends AnyFunSuite {

  test("fmt strips trailing zeros at centisecond precision") {
    assert(Bench.fmt(0.404) == "0.4")
    assert(Bench.fmt(1.0) == "1")
    assert(Bench.fmt(10.969) == "10.97")
    assert(Bench.fmt(0.0) == "0")
  }

  test("rendered bench line for every declared query fits the driver tail") {
    // 5-char worst case ("10.97") for every query; sf basename as printed.
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 10.969)
    val line = Bench.renderLine(results, "sf0.1")
    assert(line.startsWith("""{"metric":"total","value":"""))
    // 2000-char tail minus ~100 chars of sbt epilogue and slack.
    assert(line.length <= 1900,
      s"bench line is ${line.length} chars; driver tail budget is ~1900. " +
        "Trim query names or aggregate small entries before adding queries.")
  }

  test("overflow folds fastest queries into _other, keeps slowest intact") {
    val results = (1 to 300).map(i => f"query_name_$i%03d" -> i * 0.01)
    val line = Bench.renderLine(results, "sf0.1")
    assert(line.length <= Bench.LineBudget, line.length.toString)
    assert(line.contains(""""_other":"""))
    assert(line.contains(""""query_name_300":3"""))
    // total is the sum over ALL queries, not just the kept ones
    assert(line.contains(""""value":451.5"""))
  }

  test("rendered line is valid JSON shape with failed passthrough") {
    val line = Bench.renderLine(Seq("q1_agg" -> 1.23), "sf0.01", Seq("x"))
    assert(line.contains(""""queries":{"q1_agg":1.23}"""))
    assert(line.contains(""""failed":["x"]"""))
    assert(line.endsWith(""""sf":"sf0.01"}"""))
  }

  test("sweeping failure (every query failed) still fits the tail budget") {
    val names = (1 to 160).map(i => f"some_long_query_name_$i%03d")
    val results = names.map(_ -> 0.01)
    val line = Bench.renderLine(results, "sf0.1", failed = names)
    assert(line.length <= Bench.LineBudget, line.length.toString)
    // the slowest-query map folds AND the failed list folds, but the
    // marker preserves the true failure count
    assert(line.contains("more\"]"), line.takeRight(200))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench's outlier-escalation input: round 6 shipped a
  * pretty-printed bench_ref.json whose `"name": value` spacing the
  * then-regex could not parse, so prevRef was silently empty and no
  * query ever earned the >3 retries the escalation exists for.
  */
class BenchSpec extends AnyFunSuite {

  test("parsePrevRef tolerates whitespace around the colon") {
    val compact = """{"q1_agg":0.81,"q_join_bloom":0.54}"""
    val pretty  = """{"q1_agg": 0.81, "q_join_bloom":  0.54}"""
    val expected = Map("q1_agg" -> 0.81, "q_join_bloom" -> 0.54)
    assert(Bench.parsePrevRef(compact) == expected)
    assert(Bench.parsePrevRef(pretty) == expected)
  }

  test("parsePrevRef drops non-positive entries (errored queries)") {
    val txt = """{"q_ok": 1.5, "q_crashed": -1, "q_zero": 0}"""
    assert(Bench.parsePrevRef(txt) == Map("q_ok" -> 1.5))
  }

  test("parsePrevRef scopes to the queries object — a scratch map " +
    "reusing query names must not override wall seconds") {
    // the exact bench_out.json shape: scratch + tries reuse query
    // names; the old whole-file pull kept the LAST duplicate, turning
    // q_har_readall's reference into its scratch-build seconds
    val txt = """{"metric":"total","value":237.5,"unit":"sec",""" +
      """"queries":{"q_har_readall":1.752,"q1_agg":0.965},""" +
      """"tries":{"q_har_readall":[1.752],"q1_agg":[0.965]},""" +
      """"scratch":{"q_har_readall":0.883},""" +
      """"errors":{},"sf":"/root/testdata/sf0.1"}"""
    val ref = Bench.parsePrevRef(txt)
    assert(ref("q_har_readall") == 1.752,
      s"scratch seconds leaked into the reference: $ref")
    assert(ref("q1_agg") == 0.965)
    // and the non-query top-level numbers stay out of the map
    assert(!ref.contains("value"))
  }

  test("the COMMITTED bench_ref.json parses non-empty") {
    // sbt runs tests from the repo root — same cwd Bench defaults to
    val path = java.nio.file.Paths.get("bench_ref.json")
    assert(java.nio.file.Files.exists(path), s"missing $path")
    val txt = new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
    val ref = Bench.parsePrevRef(txt)
    assert(ref.size >= 100,
      s"committed bench_ref.json parsed to only ${ref.size} queries — " +
        "the outlier escalation would be dead")
    assert(ref.contains("q1_agg") && ref("q1_agg") > 0)
  }

  test("every SparkEntry query has a bench reference entry") {
    val path = java.nio.file.Paths.get("bench_ref.json")
    val txt = new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
    val ref = Bench.parsePrevRef(txt)
    val missing = SparkEntry.queries.keySet.diff(ref.keySet)
    // new queries land before the ref is refreshed; allow a small gap
    // but fail if the reference has rotted wholesale
    assert(missing.size <= 15,
      s"bench_ref.json missing ${missing.size} queries: ${missing.toSeq.sorted.take(20)}")
  }
}

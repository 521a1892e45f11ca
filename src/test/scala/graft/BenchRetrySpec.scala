package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for Bench's outlier-retry pass — the bench's self-defense against
  * a loaded measurement window (r15: the driver artifact shipped with
  * load 1.9→3.6 and five 3–20× spikes that an idle re-run disproved;
  * min-of-2 only defends against a one-off spike because a contaminated
  * window spans both repeats). Three things are pinned pure: the
  * reference-artifact parser (both dialects this repo writes), the
  * retry SELECTION rule (ratio AND absolute floor, worst-first, capped),
  * and the reference-file chooser (latest local-bench round wins).
  */
class BenchRetrySpec extends AnyFunSuite {

  test("parseRefQueries reads Bench's own artifact dialect") {
    val json = """{"metric":"total","value":67.400,"unit":"sec","runs":2,""" +
      """"env":{"load_start":0.10,"load_end":1.95,"procs_start":120,""" +
      """"procs_end":121,"other_jvms_start":0,"other_jvms_end":0},""" +
      """"queries":{"q_agg":1.234,"q_join":0.500,"q_slow":-1.0},"sf":"/x"}"""
    val got = Bench.parseRefQueries(json)
    assert(got === Map("q_agg" -> 1.234, "q_join" -> 0.5, "q_slow" -> -1.0))
  }

  test("parseRefQueries reads local_bench.py's dialect (queries last, env list before)") {
    val json = """{"metric": "total", "value": 67.4, "unit": "sec", """ +
      """"runs": "3x2 (three JVMs, per-query lower-median-of-2 each; cross-JVM median)", """ +
      """"env": [{"load": [0.1, 1.9], "jvms": [0, 0]}, {"load": [0.2, 2.0], "jvms": [0, 0]}], """ +
      """"sf": "/root/testdata/sf0.1", "queries": {"q_agg": 1.2, "q_tfidf": 0.35}}"""
    assert(Bench.parseRefQueries(json) === Map("q_agg" -> 1.2, "q_tfidf" -> 0.35))
  }

  test("parseRefQueries parses e-notation, including negative exponents") {
    // json.dump emits e-notation below 1e-4; the old char-class pattern
    // captured `1.2e` for `1.2e-05` and silently dropped the entry.
    val json = """{"queries":{"q_tiny":1.2e-05,"q_small":3.4E-3,""" +
      """"q_plus":5.0e+2,"q_plain":2.5}}"""
    assert(Bench.parseRefQueries(json) === Map(
      "q_tiny" -> 1.2e-5, "q_small" -> 3.4e-3, "q_plus" -> 500.0, "q_plain" -> 2.5))
  }

  test("parseRefQueries degrades to empty on malformed or keyless input") {
    assert(Bench.parseRefQueries("").isEmpty)
    assert(Bench.parseRefQueries("{\"value\":1}").isEmpty)
    assert(Bench.parseRefQueries("{\"queries\":").isEmpty)
    assert(Bench.parseRefQueries("not json at all").isEmpty)
  }

  test("retryCandidates gates on ratio AND absolute floor, jointly") {
    val ref = Map("q_big" -> 1.4, "q_tiny" -> 0.05, "q_slowish" -> 10.0,
      "q_fine" -> 1.0)
    val results = Seq(
      "q_big" -> 27.9,     // 20× AND +26.5 s → retry (the r15 q_item_cooccurrence shape)
      "q_tiny" -> 0.3,     // 6× but only +0.25 s → noise, no retry
      "q_slowish" -> 12.0, // +2 s but only 1.2× → genuinely slow query, no retry
      "q_fine" -> 1.1)     // neither gate
    val got = Bench.retryCandidates(results, ref, kRatio = 3.0, absFloor = 0.5, cap = 10)
    assert(got === Seq(("q_big", 27.9, 1.4)))
  }

  test("retryCandidates orders worst inflation first and honors the cap") {
    val ref = Map("q_a" -> 1.0, "q_b" -> 1.0, "q_c" -> 1.0)
    val results = Seq("q_a" -> 4.0, "q_b" -> 20.0, "q_c" -> 8.0)
    val got = Bench.retryCandidates(results, ref, 3.0, 0.5, cap = 2)
    assert(got.map(_._1) === Seq("q_b", "q_c"))
  }

  test("retryCandidates never selects failed (-1) or reference-missing queries") {
    val ref = Map("q_failed" -> 1.0, "q_refbad" -> -1.0)
    val results = Seq("q_failed" -> -1.0, "q_refbad" -> 9.0, "q_new" -> 9.0)
    assert(Bench.retryCandidates(results, ref, 3.0, 0.5, 10).isEmpty)
  }

  test("latestLocalBench picks the highest round, suffix breaking ties") {
    val dir = java.nio.file.Files.createTempDirectory("bench_ref").toFile
    Seq("BENCH_LOCAL_r09.json", "BENCH_LOCAL_r10.json", "BENCH_LOCAL_r10b.json",
      "BENCH_r11.json", "notes.txt").foreach { n =>
      java.nio.file.Files.writeString(new java.io.File(dir, n).toPath, "{}")
    }
    assert(Bench.latestLocalBench(dir).map(_.getName) === Some("BENCH_LOCAL_r10b.json"))
    val empty = java.nio.file.Files.createTempDirectory("bench_ref_empty").toFile
    assert(Bench.latestLocalBench(empty).isEmpty)
  }
}

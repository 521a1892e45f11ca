package graft

/** Liveness pins for the shuffle-bytes census (tools.ShuffleCensus): the
  * tool's first cut went silently blind — taskMetrics.inputMetrics read
  * whole tables as 0 bytes on small local files, making every amp
  * garbage — so the census's three measurement legs are pinned here on
  * known-shape queries at sf0.001:
  *   - a shuffling query must record shuffle bytes > 0 (listener live),
  *   - a map-only query must record exactly 0 (attribution not bleeding
  *     across queries through the async bus),
  *   - a construction-materialized query must carry scan=0 / amp=-1 (the
  *     documented checkpoint-curtain semantics, not a crash or an inf).
  */
class ShuffleCensusSpec extends SparkSpec {

  test("shuffle census: listener live, attribution clean, curtain semantics pinned") {
    val sf = "/root/testdata/sf0.001"
    sys.props("graft.frame.cache.disable") = "1"
    try {
      spark.catalog.clearCache()
      // ORDER MATTERS for the attribution leg: the shuffling query runs
      // FIRST, so a stale/undrained listener would leak its bytes into
      // the map-only query's row and fail the == 0 assert.
      val rows = tools.ShuffleCensus
        .census(spark, sf, Seq("q_sessionize", "q_clean_enrich", "q_bpe_train"))
        .map(r => r._1 -> r).toMap
      assert(rows.size === 3, s"census dropped a query: ${rows.keys}")

      val (_, sScan, sWrite, sRead, _, sAmp) = rows("q_sessionize")
      assert(sScan > 0, "sessionize plans a parquet scan; scan bytes must be > 0")
      assert(sWrite > 0 && sRead > 0,
        s"sessionize shuffles (visitor-partition window); listener read w=$sWrite r=$sRead — blind")
      assert(sAmp > 0)

      val (_, cScan, cWrite, cRead, _, _) = rows("q_clean_enrich")
      assert(cScan > 0)
      assert(cWrite === 0L && cRead === 0L,
        s"clean_enrich is map-only; nonzero shuffle (w=$cWrite r=$cRead) means " +
          "attribution bled from the previous query through the listener bus")

      val (_, bScan, _, _, _, bAmp) = rows("q_bpe_train")
      assert(bScan === 0L && bAmp === -1.0,
        s"bpe_train materializes during construction (checkpoint curtain): " +
          s"expected scan=0/amp=-1, got scan=$bScan amp=$bAmp")
    } finally {
      sys.props.remove("graft.frame.cache.disable")
      spark.catalog.clearCache()
    }
  }

  test("diff mode: artifact parser reads real table rows, skips noise, keeps '-' amps") {
    // the r15 diff mode turns the magnitude axis from re-run-and-eyeball
    // into a machine diff; its parser must survive the artifact's noise
    // lines (header, wrapper output, FAILED rows, the summary) and the
    // '-' amp of scan-less iterative plans — a silent zero-row parse
    // would make every diff vacuously clean, which main() guards against
    val artifact = Seq(
      "[wrapper] gate open at load 0.00",
      "query                               scan_mb  shuffle_w_mb  shuffle_r_mb  spill_mb     amp",
      "q_bpe_encode                            0.6          3.11          3.11       0.0    5.49",
      "q_zorder                                2.0          0.00          0.00       0.0    0.00",
      "q_bpe_train                             0.0          3.11          3.11       0.0       -",
      "q_broken                           FAILED: SparkException: boom",
      "[shuffle-census] 135 queries: scan 382 MB, shuffle write 135 MB (amp 0.35), read 135 MB, spill 0 MB")
    val parsed = tools.ShuffleCensus.parseArtifact(artifact.iterator)
    assert(parsed.keySet === Set("q_bpe_encode", "q_zorder", "q_bpe_train"))
    assert(parsed("q_bpe_encode") === ((0.6, 3.11, 3.11, 0.0, 5.49)))
    assert(parsed("q_bpe_train")._5 === -1.0, "'-' amp must parse as -1, not drop the row")
  }

  test("diff mode: only moves past BOTH the absolute floor and the tol ratio are flagged") {
    val mb = 1024L * 1024L
    def cur(n: String, wMb: Double, amp: Double) =
      (n, 10L * mb, (wMb * mb).toLong, (wMb * mb).toLong, 0L, amp)
    val prior = Map(
      "q_same" -> (10.0, 2.0, 2.0, 0.0, 0.2),       // unchanged
      "q_wobble" -> (10.0, 0.05, 0.05, 0.0, 0.005), // 4x ratio but under the 0.25 MB floor
      "q_fat" -> (10.0, 2.0, 2.0, 0.0, 0.2),        // write 2 -> 6 MB: flagged (both gates)
      "q_creep" -> (10.0, 10.0, 10.0, 0.0, 1.0),    // 10 -> 11 MB: past floor, under ratio
      "q_iter" -> (0.0, 3.0, 3.0, 0.0, -1.0),       // '-' amp on both sides: amp leg skipped
      "q_gone" -> (10.0, 5.0, 5.0, 0.0, 0.5))       // no longer registered
    val current = Seq(
      cur("q_same", 2.0, 0.2),
      cur("q_wobble", 0.2, 0.02),
      cur("q_fat", 6.0, 0.6),
      cur("q_creep", 11.0, 1.1),
      cur("q_iter", 3.0, -1.0),
      cur("q_new_fat", 4.0, 0.4),                   // new query shipping real bytes
      cur("q_new_tiny", 0.1, 0.01))                 // new but under the floor: silent
    val moved = tools.ShuffleCensus.diffRows(current, prior, tol = 2.0)
    val byKey = moved.map(m => (m._1, m._2)).toSet
    assert(byKey === Set(
      ("q_fat", "shuffle_w_mb"), ("q_fat", "amp"),
      ("q_new_fat", "NEW"), ("q_gone", "GONE")), s"got $moved")
    // flagged rows carry (prior, current) for the one-line adjudication
    val fat = moved.find(m => m._1 == "q_fat" && m._2 == "shuffle_w_mb").get
    assert(fat._3 === 2.0 && math.abs(fat._4 - 6.0) < 1e-9)
  }
}

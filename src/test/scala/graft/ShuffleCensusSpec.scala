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
}

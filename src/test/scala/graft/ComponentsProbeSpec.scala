package graft

import graft.ext.{Dedup, Similarity}

/**
 * Drift guard for [[graft.tools.ComponentsProbe]]: the probe runs the
 * REAL operators (lshNearDupPairs + componentsFromEdges, instrumented
 * through `onBands` and the CcHooks checkpoint seam) but still owns the
 * 4-line composition and the registration parameters — this pin keeps
 * that composition identical to `Similarity.embeddingComponents`, and
 * certifies the instrumentation seams themselves are semantics-neutral
 * (same contract as BpeTrainProbe asserting its probed winners equal the
 * trainer's).
 */
class ComponentsProbeSpec extends SparkSpec {

  test("probe restatement produces the operator's exact label table") {
    val sf = "/root/testdata/sf0.001"
    val probed = graft.tools.ComponentsProbe.probed(spark, sf, 20, None)
    val real = Similarity.embeddingComponents(Tables.embeddings(spark, sf),
      planesPerBand = Similarity.ProductionPlanesPerBand,
      maxBucketSize = Dedup.ProductionMaxBucketSize)
    val diff = probed.except(real).count() + real.except(probed).count()
    assert(diff == 0, s"probe drifted from operator: $diff differing rows")
    spark.catalog.clearCache()
  }

  test("prepart variant is label-identical (adjudicated slower, kept as probe arm only)") {
    // the r13 matched-pair A/B measured prepart ~3 s SLOWER per sf10 run
    // in both orders (PLANS.md r13 §1) — the flag stays a probe arm, and
    // this pin proves the arm it measures is semantics-preserving
    val sf = "/root/testdata/sf0.001"
    val a = graft.tools.ComponentsProbe.probed(spark, sf, 20, None)
    val b = graft.tools.ComponentsProbe.probed(spark, sf, 20, None, prepart = true)
    val diff = a.except(b).count() + b.except(a).count()
    assert(diff == 0, s"prepart arm drifted: $diff differing rows")
    spark.catalog.clearCache()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Measurement pins for the task-skew census (tools.SkewCensus): the
  * statistic's math is pinned pure, and the listener legs are pinned on
  * three known-shape plans — a hot-key shuffle must read as maximally
  * skewed, its salted twin as balanced (the in-miniature version of the
  * q_item_interactions salting design the fleet census exists to
  * certify), and a uniform shuffle as near-1. AQE is disabled inside the
  * measured bodies: its coalescing MERGES the empty partitions into the
  * fat one and hides exactly the imbalance the census must see (on a
  * cluster the fat task still exists — AQE splits reduce-side skew only
  * for joins, not for arbitrary repartitions).
  */
class SkewCensusSpec extends SparkSpec {
  import tools.SkewCensus

  test("skewOf: balanced=1, one-hot=n, degenerate inputs read as balanced") {
    assert(SkewCensus.skewOf(Seq(5L, 5L, 5L, 5L)) === 1.0)
    assert(SkewCensus.skewOf(Seq(20L, 0L, 0L, 0L)) === 4.0)
    assert(SkewCensus.skewOf(Seq.empty) === 1.0)
    assert(SkewCensus.skewOf(Seq(0L, 0L)) === 1.0)
    // bounded: max/mean never exceeds the task count
    assert(SkewCensus.skewOf(Seq(7L, 1L, 1L, 1L)) <= 4.0)
  }

  test("hot-key shuffle reads maximally skewed; salted twin reads balanced") {
    import spark.implicits._
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // 40k rows, ALL on one key, with a payload fat enough to clear the
      // spec's byte floor — the one-reducer-gets-everything pathology
      val hot = spark.range(40000)
        .select(lit(0L).as("k"), concat(lit("x"), col("id")).as("payload"))
      val hotStages = SkewCensus.measure(spark) {
        hot.repartition(4, col("k")).write.format("noop").mode("overwrite").save()
      }
      val (hs, hotSkew, _, hotBytes) =
        SkewCensus.worstStage(hotStages, minTasks = 4, minBytes = 1L).get
      assert(hotBytes > 0, "hot shuffle recorded no bytes — listener blind")
      assert(hs.tasks === 4)
      // one of 4 tasks carries everything: skew == 4 exactly
      assert(hotSkew === 4.0, s"expected one-hot skew 4.0, got $hotSkew")

      // the salting fix: same rows, same key, a salt joins the
      // partitioning key — every reducer now carries ~1/4 of the bytes.
      // 64 salt values, not 4: hash((k, salt)) mod 4 over only 4 salts
      // collides (measured skew 2.01 — two salts in one bucket); 64 gives
      // the hash room to equidistribute, which is how production salting
      // picks its fan-out too (≫ partition count, not == it)
      val salted = SkewCensus.measure(spark) {
        spark.range(40000)
          .select(lit(0L).as("k"), concat(lit("x"), col("id")).as("payload"),
            (col("id") % 64).as("salt"))
          .repartition(4, col("k"), col("salt"))
          .write.format("noop").mode("overwrite").save()
      }
      val (_, saltSkew, _, saltBytes) =
        SkewCensus.worstStage(salted, minTasks = 4, minBytes = 1L).get
      assert(saltBytes > 0)
      assert(saltSkew < 2.0,
        s"salted shuffle should be near-balanced, got $saltSkew")
      assert(saltSkew < hotSkew)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("diff mode: parser reads real rows, movers gate on floor AND ratio, crossings stay silent") {
    // parser: header / flag / noise lines skipped by row shape
    val artifact = Seq(
      "query                              stages  tasks  stage_mb  skew_b  skew_t",
      "q_containment                          20     20    402.04    5.01    4.48",
      "q_tfidf                                 8     32    168.65    1.00    1.03",
      "q_quiet                                 4      0      0.00    1.00    1.00",
      "[skew-flag] q_containment           skew_b 5.01 over 20 tasks, 402.0 MB",
      "26/08/16 WARN noise")
    val prior = SkewCensus.parseArtifact(artifact.iterator)
    assert(prior === Map("q_containment" -> ((20, 5.01)),
      "q_tfidf" -> ((32, 1.00)), "q_quiet" -> ((0, 1.00))))
    def row(n: String, tasks: Int, sb: Double) = (n, 5, tasks, 1L << 21, sb, 1.0)
    // mover: clears 0.5 absolute AND 2x ratio; absent queries report GONE
    assert(SkewCensus.diffRows(Seq(row("q_tfidf", 32, 2.6)), prior, 2.0, 4.0).toSet
      === Set(("q_containment", "GONE", 5.01, -1.0), ("q_quiet", "GONE", 1.0, -1.0),
        ("q_tfidf", "skew_b", 1.0, 2.6)))
    val full = Seq(row("q_containment", 20, 5.0), row("q_tfidf", 32, 1.4),
      row("q_quiet", 0, 1.0))
    // ratio-only (1.0 -> 1.4: ratio clears nothing) and within-tol moves silent
    assert(SkewCensus.diffRows(full, prior, 2.0, 4.0).isEmpty)
    // threshold crossing (prior had no qualifying stage) is NOT a mover
    assert(SkewCensus.diffRows(Seq(row("q_quiet", 16, 3.0), row("q_containment", 20, 5.0),
      row("q_tfidf", 32, 1.0)), prior, 2.0, 4.0).isEmpty)
    // NEW query prints only when it would be flag-worthy
    assert(SkewCensus.diffRows(full :+ row("q_new_hot", 16, 6.0), prior, 2.0, 4.0)
      === Seq(("q_new_hot", "NEW", -1.0, 6.0)))
    assert(SkewCensus.diffRows(full :+ row("q_new_ok", 16, 1.2), prior, 2.0, 4.0).isEmpty)
    // a query that CRASHED this census is FAILED, never GONE, and always a
    // row — an otherwise-clean diff with a crashing query must not read CLEAN
    val crashed = Seq(row("q_tfidf", 32, 1.0), row("q_quiet", 0, 1.0))
    assert(SkewCensus.diffRows(crashed, prior, 2.0, 4.0, failed = Set("q_containment"))
      === Seq(("q_containment", "FAILED", 5.01, -1.0)))
    // failed-but-never-seen-before still surfaces (prior reading -1)
    assert(SkewCensus.diffRows(full, prior, 2.0, 4.0, failed = Set("q_brand_new"))
      === Seq(("q_brand_new", "FAILED", -1.0, -1.0)))
  }

  test("uniform-key shuffle reads near-balanced; sub-threshold stages are ignored") {
    import spark.implicits._
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val uniform = spark.range(40000)
        .select((col("id") % 997).as("k"), concat(lit("x"), col("id")).as("payload"))
      val stages = SkewCensus.measure(spark) {
        uniform.repartition(4, col("k")).write.format("noop").mode("overwrite").save()
      }
      val (_, skew, _, bytes) =
        SkewCensus.worstStage(stages, minTasks = 4, minBytes = 1L).get
      assert(bytes > 0)
      assert(skew < 1.5, s"997 uniform keys over 4 reducers, got skew $skew")
      // threshold legs: demanding more tasks than any stage ran, or more
      // bytes than the job shuffled, must yield None — not a noise row
      assert(SkewCensus.worstStage(stages, minTasks = 64, minBytes = 1L).isEmpty)
      assert(SkewCensus.worstStage(stages, minTasks = 4,
        minBytes = Long.MaxValue).isEmpty)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }
}

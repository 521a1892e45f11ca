package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis

/**
 * AQE skew-join engagement probe — the runtime-re-plan half of the skew
 * story (the engine's own mitigation, two-phase salting / capped posting
 * lists, is measured in SkewBench and SparseSim; this probe establishes
 * WHICH engine join shapes `OptimizeSkewedJoin` can actually rescue).
 *
 * Two families, both forced to sort-merge (broadcast thresholds -1 — the
 * real-scale shape once the build side outgrows any broadcast budget):
 *
 *  - `vocab_tfidf` / `vocab_bm25`: the Zipf-skewed token join. Expected
 *    INELIGIBLE, and the probe pins that: the df side of the join is
 *    Sort ← HashAggregate ← ShuffleQueryStage, and the rule only matches
 *    Sort ← ShuffleQueryStage children (splitting a partition under a
 *    final aggregate would scatter a group across readers). Agg-fed
 *    joins — the engine's most common join shape — therefore rely on the
 *    engine's OWN skew guards at scale, not on AQE.
 *
 *  - `view_purchase_hot`: raw-scan equi-join (visitor attribution,
 *    StreamJob.viewPurchaseAttribution batch form) with a deterministic
 *    hot key — 10% of events remapped to one visitor, the bot-grade
 *    profile its scaladoc warns about. Both children are
 *    Sort ← ShuffleQueryStage, so the rule applies; the probe requires
 *    `skew=true` markers and split AQE partition specs in the ON mode.
 *
 * Hard-won eligibility facts this probe encodes (each one silently
 * yielded zero engagement until found):
 *  1. Skew splits are MAP-OUTPUT RANGES (PartialReducerPartitionSpec):
 *     a skewed partition whose bytes come from one map task cannot be
 *     split at all. The driver's single-row-group parquet scans as one
 *     map task at every SF — hence the repartition hop below.
 *  2. The final plan root is a ResultQueryStage LEAF; node-typed
 *     evidence (AQEShuffleReadExec, ShuffleQueryStageExec.mapStats)
 *     requires recursing through every QueryStageExec curtain, not
 *     just the AdaptiveSparkPlanExec one.
 *  3. Thresholds gate on BYTES (default 256 MB), and the advisory size
 *     is the split target — both must be corpus-scaled or a toy corpus
 *     never qualifies.
 *
 * Executes the SAME QueryExecution it inspects (the VocabFlip lesson: a
 * derived count() leaves this plan's AQE un-finalized). Thresholds are
 * local-corpus-scaled (defaults are cluster-partition-sized) and
 * coalescing is off so the split evidence isn't re-merged at toy sizes.
 *
 * Usage: runMain graft.tools.SkewJoinProbe <sfDir> [runs]
 * One JSON line per (family, mode); exits nonzero if the eligible family
 * fails to engage, or if a vocab family unexpectedly DOES (that would
 * mean the shape changed and the scale story should be re-examined).
 */
object SkewJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // partition-level skew is a function of reducer COUNT: over 8 reducers
    // a key holding 10% of rows barely lifts its partition above the
    // median, over 128 it dominates its partition ~13× — the cluster-scale
    // geometry this probe is about. Overridable via SKEW_PARTS.
    val parts = sys.env.getOrElse("SKEW_PARTS", "128")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // the real-scale join shape: no broadcast escape hatch
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = graft.Tables.documents(spark, sfDir)
    // deterministic bot: SKEW_HOT/10ths of all events collapse onto
    // visitor -1 (default 1 → 10%). The repartition hop matters: skew
    // SPLITS are map-output ranges (PartialReducerPartitionSpec), and the
    // single-row-group local parquet scans as ONE map task — every skewed
    // partition would be structurally unsplittable however large. The hop
    // gives the join's shuffle a multi-map-task write side, the geometry
    // any cluster-scale scan has natively.
    val hotTenths = sys.env.getOrElse("SKEW_HOT", "1").toInt
    val scanTasks = sys.env.getOrElse("SKEW_MAPS", "16").toInt
    def hotEvents = {
      val e = graft.Tables.clickstream(spark, sfDir).repartition(scanTasks)
      e.withColumn("visitorid",
        when(pmod(crc32(col("visitorid").cast("string")), lit(10)) < lit(hotTenths), lit(-1L))
          .otherwise(col("visitorid")))
    }
    val families: Seq[(String, Boolean, () => DataFrame)] = Seq(
      ("vocab_tfidf", false, () => TextAnalysis.termDocFreq(docs)),
      ("vocab_bm25", false, () => TextAnalysis.bm25(docs)),
      ("view_purchase_hot", true, () => {
        val h = hotEvents
        graft.stream.StreamJob.viewPurchaseAttribution(
          h.filter(col("event") === "view"),
          h.filter(col("event") === "purchase"), streaming = false)
      }))

    var bad = false
    for (skewOn <- Seq(true, false); (name, eligible, build) <- families) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn)
      // local-corpus-scaled thresholds; the defaults (factor 5 / 256 MB)
      // are cluster-partition-sized. Overridable via SKEW_THRESHOLD.
      val thr = sys.env.getOrElse("SKEW_THRESHOLD", "4k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", thr)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", thr)
      // coalescing would re-merge the split reads at this tiny scale and
      // hide the evidence; at cluster scale both run with real sizes
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("SKEW_COALESCE", "false"))
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin",
        sys.env.getOrElse("SKEW_FORCE", "false"))
      var skewedJoins = 0
      var aqeReads: Seq[Int] = Nil
      val times = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val qe = build().queryExecution
        qe.toRdd.count()
        val planStr = qe.executedPlan.toString
        skewedJoins = "skew=true".r.findAllIn(planStr).length
        // executedPlan is an AdaptiveSparkPlanExec LEAF — go through the
        // curtain to the FINAL plan for node-typed evidence
        // final-plan traversal: AdaptiveSparkPlanExec AND every QueryStageExec
        // (ResultQueryStage, ShuffleQueryStage) are LEAF nodes wrapping their
        // real subtree — plain collect stops at each curtain
        def finalNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
          val here = p.collect { case n => n }
          here ++ here.flatMap {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              finalNodes(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              finalNodes(q.plan)
            case _ => Nil
          }
        }
        val nodes = finalNodes(qe.executedPlan)
        aqeReads = nodes.collect {
          case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
            r.partitionSpecs.length
        }
        if (sys.env.get("GRAFT_SKEW_STATS").contains("1")) {
          nodes.foreach {
            case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
              s.mapStats.foreach { ms =>
                val sz = ms.bytesByPartitionId.sorted
                val med = sz(sz.length / 2)
                System.err.println(s"[stats] stage=${s.id} parts=${sz.length} " +
                  s"max=${sz.last} median=$med nonzero=${sz.count(_ > 0)} total=${sz.sum}")
              }
            case _ =>
          }
        }
        if (sys.env.get("GRAFT_SKEW_EXPLAIN").contains("1"))
          println(planStr.take(6000))
        (System.nanoTime() - t0) / 1e9
      }
      val sec = times.sorted.apply((runs - 1) / 2)
      if (skewOn && eligible && skewedJoins == 0) bad = true
      if (skewOn && !eligible && skewedJoins > 0) bad = true
      println(s"""{"family":"$name","mode":"${if (skewOn) "skew_on" else "skew_off"}",""" +
        s""""sec":${"%.2f".format(sec)},"skewed_joins":$skewedJoins,""" +
        s""""aqe_reads":${aqeReads.mkString("[", ",", "]")}}""")
    }
    spark.stop()
    if (bad) {
      System.err.println("[skewjoin] eligibility expectations violated — see lines above")
      sys.exit(1)
    }
  }
}

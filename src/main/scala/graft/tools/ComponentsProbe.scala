package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Stage split for `q_embed_components` — the r13 instance of the
 * BpeTrainProbe methodology (VERDICT r12 item 1: "it is now the engine's
 * largest scaled cost (40.4 s at sf10); run a per-round stage table or a
 * measured already-optimal adjudication"). The query is
 * [[graft.ext.Similarity.embeddingComponents]] =
 * [[graft.ext.Similarity.lshNearDupPairs]] (candidate edges) feeding
 * [[graft.ext.Dedup.componentsFromEdges]] (min-label propagation); this
 * probe restates both bodies verbatim with a timer at every
 * materialization barrier, so the wall clock decomposes into:
 *
 *   bands_persist  scan → 64-plane signatures → posexplode → bucket cap
 *                  window → DISK_ONLY persist (materialized via count)
 *   bucket_join    self-join on (band, key) → streamed cosine → threshold
 *                  → distinct → ids semi-join → eager localCheckpoint
 *   setup          touched/symAll/labels0 checkpoints (3 small jobs)
 *   round_N        one batched propagation round (3 steps + checkpoint +
 *                  decimal label-sum convergence action)
 *   finish         inactive-id anti-join union + final count
 *
 * Per phase it prints wall + JVM GC delta + block-manager storage delta —
 * the BPE probe's three columns that separate "GC pressure" from "blocks
 * piling up" from "the phase genuinely does more work".
 *
 * `ser=1` switches EVERY localCheckpoint in the probe — the bucket_join
 * edge barrier, the setup checkpoints (touched/symAll/labels0), and the
 * loop-side round checkpoints — to MEMORY_AND_DISK_SER, the lever that
 * bought q_bpe_encode 28×→12.7× (flat GC at sf10). The label tables here
 * are two long columns, so the prediction going in is that the level is
 * neutral and the candidate phases dominate; the probe exists to
 * measure, not to assume.
 *
 * Drift guard: the restated pipeline's final label table is hash-compared
 * against the real operator's output when `parity=1` (costs a second full
 * run — default off at sf10, exercised by ComponentsProbeSpec at sf0.001).
 *
 * `prepart=1` shuffles+sorts symAll by doc2 ONCE into its checkpoint
 * (LogicalRDD preserves partitioning and ordering), so each propagation
 * round's SMJ exchanges only the label table — the candidate fix for the
 * rounds re-shuffling 2|E| rows per step.
 *
 * Usage: runMain graft.tools.ComponentsProbe <sfDir> [maxRounds=20] [ser=0] [parity=0] [prepart=0]
 * Output: one JSON line per phase {"phase":…,"sec":…,"gc_ms":…,"storage_mb":…}
 * plus edge/label count lines.
 */
object ComponentsProbe {

  def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  /** Block-manager MEMORY + DISK in use. Memory alone (getMemoryStatus
    * max-free) is blind to this probe's own dominant storage — the bands
    * DISK_ONLY persist and disk-resident checkpoint blocks — so a
    * memory-only delta would read ~0 while blocks pile up on disk. */
  def storageMb: Long = {
    val status = org.apache.spark.SparkEnv.get.blockManager.master
    val mem = status.getMemoryStatus.values.map { case (max, free) => max - free }.sum
    val disk = status.getStorageStatus.map(_.diskUsed).sum
    (mem + disk) / (1024 * 1024)
  }

  /** Restated [[graft.ext.Similarity.embeddingComponents]] with a timer at
    * each barrier; returns (labels, per-phase log). Bodies are verbatim from
    * Similarity.scala / Dedup.scala — the parity flag certifies the copy. */
  def probed(spark: SparkSession, sfDir: String, maxRounds: Int,
             level: Option[StorageLevel], prepart: Boolean = false): DataFrame = {
    import graft.ext.{Dedup, Similarity}
    def timed[A](phase: String)(f: => A): A = {
      val g0 = gcMs; val s0 = storageMb
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"phase":"$phase","sec":${(System.nanoTime() - t0) / 1e9}%.2f,""" +
        f""""gc_ms":${gcMs - g0},"storage_mb_delta":${storageMb - s0}}""")
      r
    }
    def ckpt(df: DataFrame): DataFrame = level match {
      case Some(l) => df.localCheckpoint(true, l)
      case None => df.localCheckpoint(true)
    }
    val embeddings = graft.Tables.embeddings(spark, sfDir)
    val ids = embeddings.select(col("vec_id").as("doc_id"))

    // ---- lshNearDupPairs body (Similarity.scala:131-180), split at the
    // bands persist so the signature pass and the bucket join are separate
    // stanzas. Parameters are EXACTLY the q_embed_components registration
    // (SparkEntry.scala:133): production 16-plane banding + the 10k bucket
    // cap — the first cut of this probe ran the 4-plane test layout
    // uncapped and measured a 17.4M-edge quadratic blowup that the real
    // query never executes.
    val sig = Similarity.withLshBands(embeddings, 64,
      Similarity.NumBands, Similarity.ProductionPlanesPerBand)
    val bands = Dedup.capBuckets(
      sig.select(col("vec_id"), col("embedding"), col("nrm"), posexplode(col("bands")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key"),
      Dedup.ProductionMaxBucketSize).persist(StorageLevel.DISK_ONLY)
    timed("bands_persist") { bands.count() }
    val b1 = bands.select(col("band"), col("band_key"),
      col("vec_id").as("id1"), col("embedding").as("emb1"), col("nrm").as("nrm1"))
    val b2 = bands.select(col("band"), col("band_key"),
      col("vec_id").as("id2"), col("embedding").as("emb2"), col("nrm").as("nrm2"))
    val edges = b1.join(b2, Seq("band", "band_key"))
      .filter(col("id1") < col("id2"))
      .withColumn("cosine", Similarity.dot("emb1", "emb2") / (col("nrm1") * col("nrm2")))
      .filter(col("cosine") >= 0.35)
      .select("id1", "id2", "cosine").distinct()
      .select(col("id1").as("doc1"), col("id2").as("doc2"))

    // ---- componentsFromEdges body (Dedup.scala:265-376) at probe
    // granularity: `e`'s eager checkpoint is the bucket-join barrier.
    val e = timed("bucket_join") {
      val f = ckpt(edges
        .join(ids.select(col("doc_id").as("doc1")), Seq("doc1"), "left_semi")
        .join(ids.select(col("doc_id").as("doc2")), Seq("doc2"), "left_semi")
        .select(col("doc1"), col("doc2")))
      println(s"""{"edges":${f.count()}}""")
      f
    }
    val (symAll, touched, inactive, labels0) = timed("setup") {
      val sym = e.union(e.select(col("doc2").as("doc1"), col("doc1").as("doc2")))
      val touched = ckpt(sym.select(col("doc1").as("doc_id")).distinct())
      val inactive = ids.join(touched, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("component"))
      // prepart: every propagation step joins symAll on doc2 — shuffle and
      // sort the big side ONCE into the checkpoint (LogicalRDD preserves
      // outputPartitioning + outputOrdering), so each round's SMJ exchanges
      // only the small label table instead of re-shuffling 2|E| rows
      val symAllRaw = sym
        .union(touched.select(col("doc_id").as("doc1"), col("doc_id").as("doc2")))
      val symAll = ckpt(
        if (prepart) symAllRaw.repartition(col("doc2")).sortWithinPartitions("doc2")
        else symAllRaw)
      val labels0 = ckpt(ids.join(touched, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("doc_id").as("component")))
      println(s"""{"touched":${touched.count()}}""")
      (symAll, touched, inactive, labels0)
    }
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val r = df.agg(sum(col("component").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    def step(labels: DataFrame): DataFrame = {
      val merged = symAll
        .join(labels.select(col("doc_id").as("nbr"), col("component")),
          col("doc2") === col("nbr"))
        .groupBy(col("doc1")).agg(min(col("component")).as("component"))
        .withColumnRenamed("doc1", "doc_id")
      merged.as("m")
        .join(merged.select(col("doc_id").as("t_id"), col("component").as("t_comp")),
          col("component") === col("t_id"))
        .select(col("doc_id"), col("t_comp").as("component"))
    }
    var labels = labels0
    var prevSum = labelSum(labels)
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val stepsThisBatch = math.min(3, maxRounds - round)
      val next = timed(s"round_${round + stepsThisBatch}") {
        val n = ckpt((1 to stepsThisBatch).foldLeft(labels)((l, _) => step(l)))
        n.count(); n
      }
      val s = labelSum(next)
      labels = next
      if (s == prevSum) converged = true
      prevSum = s
      round += stepsThisBatch
    }
    if (!converged && labelSum(step(labels)) == prevSum) converged = true
    require(converged, s"did not converge within $maxRounds rounds")
    timed("finish") {
      val out = labels.union(inactive)
        .select(col("doc_id").as("vec_id"), col("component"))
      println(s"""{"labels":${out.count()}}""")
      // release the bands DISK_ONLY persist: in parity mode (and in the
      // spec's back-to-back probed() calls) a stale resident frame would
      // otherwise compete for disk + block-manager bookkeeping while the
      // comparison operator runs at sf10
      bands.unpersist(blocking = false)
      out
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxRounds = if (args.length > 1) args(1).toInt else 20
    val ser = args.length > 2 && args(2) == "1"
    val parity = args.length > 3 && args(3) == "1"
    val prepart = args.length > 4 && args(4) == "1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SketchExprs.register(spark)
    val level = if (ser) Some(StorageLevel.MEMORY_AND_DISK_SER) else None
    println(s"""{"probe":"components","sf":"$sfDir","ser":$ser,"prepart":$prepart}""")
    val t0 = System.nanoTime()
    val out = probed(spark, sfDir, maxRounds, level, prepart)
    println(f"""{"phase":"TOTAL","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    if (parity) {
      val real = graft.ext.Similarity.embeddingComponents(
        graft.Tables.embeddings(spark, sfDir), maxRounds = maxRounds,
        planesPerBand = graft.ext.Similarity.ProductionPlanesPerBand,
        maxBucketSize = graft.ext.Dedup.ProductionMaxBucketSize)
      val diff = out.except(real).count() + real.except(out).count()
      require(diff == 0, s"probe drifted from operator: $diff differing rows")
      println(s"""{"parity":"ok"}""")
    }
    spark.stop()
  }
}

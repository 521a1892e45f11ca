package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ext.{Dedup, Similarity}

/**
 * Cache-pressure experiment for [[Similarity.lshNearDupPairs]] — the
 * round-8 verdict's open question. The production shape persists the
 * exploded bands frame WITH the embedding per (vector, band), i.e.
 * numBands× the embedding bytes, so the cosine computes as candidates
 * stream out of the bucket self-join (no re-join of embeddings onto the
 * full candidate stream). Three configurations, same production banding
 * (16 planes/band, 10k bucket cap), measured on wall time, cached bytes
 * (memory + disk, from the app-status store), and output count equality:
 *
 *  - `memdisk`  the default: fat bands at MEMORY_AND_DISK
 *  - `diskonly` fat bands at DISK_ONLY — frees the block-cache for the
 *               bucket join's hash maps at the price of re-reading the
 *               frame from disk on each side of the self-join
 *  - `slim`     the rejected-in-round-7 shape, persisted both ways: a
 *               slim (band, band_key, vec_id) bands frame plus a 1×
 *               (vec_id, embedding, nrm) frame; candidate ids distinct
 *               FIRST, then embeddings joined back on twice. Minimal
 *               cache bytes, but the candidate stream crosses two extra
 *               shuffled joins.
 *
 * Usage: runMain graft.tools.LshCachePressure <sfDir> [<sfDir2> ...]
 */
object LshCachePressure {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LshCachePressure <sfDir> [<sfDir2> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("GRAFT_PROBE_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    /** The slim variant, built from the same production knobs. Both frames
      * persisted at MEMORY_AND_DISK; the bands frame carries no embedding. */
    def slimPairs(emb: DataFrame, threshold: Double): (DataFrame, Seq[DataFrame]) = {
      val sig = Similarity.withLshBands(emb,
        planesPerBand = Similarity.ProductionPlanesPerBand).persist()
      // mirror of Dedup.capBuckets (private[ext]) on the slim projection
      val slim = sig.select(col("vec_id"), posexplode(col("bands")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
        .withColumn("_bucket_n",
          count(lit(1)).over(Window.partitionBy(col("band"), col("band_key"))))
        .filter(col("_bucket_n") <= Dedup.ProductionMaxBucketSize.get)
        .drop("_bucket_n")
        .persist()
      val b1 = slim.select(col("band"), col("band_key"), col("vec_id").as("id1"))
      val b2 = slim.select(col("band"), col("band_key"), col("vec_id").as("id2"))
      val cand = b1.join(b2, Seq("band", "band_key"))
        .filter(col("id1") < col("id2"))
        .select("id1", "id2").distinct()
      val e1 = sig.select(col("vec_id").as("id1"),
        col("embedding").as("emb1"), col("nrm").as("nrm1"))
      val e2 = sig.select(col("vec_id").as("id2"),
        col("embedding").as("emb2"), col("nrm").as("nrm2"))
      val out = cand.join(e1, "id1").join(e2, "id2")
        .withColumn("cosine", Similarity.dot("emb1", "emb2") / (col("nrm1") * col("nrm2")))
        .filter(col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
      (out, Seq(sig, slim))
    }

    // GRAFT_LSH_MODES=slim (comma-sep) restricts the run — lets a mode
    // that dies at scale be re-run alone with its full stack trace
    val wanted = sys.env.get("GRAFT_LSH_MODES").map(_.split(",").toSet)
    args.foreach { dir =>
      val emb = graft.Tables.embeddings(spark, dir)
      val allModes: Seq[(String, () => (DataFrame, Seq[DataFrame]))] = Seq(
        "memdisk" -> (() => (Similarity.lshNearDupPairs(emb,
          planesPerBand = Similarity.ProductionPlanesPerBand,
          maxBucketSize = Dedup.ProductionMaxBucketSize), Nil)),
        "diskonly" -> (() => (Similarity.lshNearDupPairs(emb,
          planesPerBand = Similarity.ProductionPlanesPerBand,
          maxBucketSize = Dedup.ProductionMaxBucketSize,
          bandsStorage = StorageLevel.DISK_ONLY), Nil)),
        "slim" -> (() => slimPairs(emb, threshold = 0.35)),
      )
      val modes = allModes.filter { case (m, _) => wanted.forall(_.contains(m)) }
      // INTERLEAVED rounds (mode A run 1, mode B run 1, mode A run 2, …):
      // this host carries sibling JVMs whose load drifts on the minute
      // scale — mode-grouped runs confound the comparison with whatever
      // the machine was doing during that mode's block. Per-run times are
      // printed so an outlier round is visible instead of buried in the
      // median; loadavg is stamped per run for the same reason.
      def loadavg: Double =
        scala.util.Try(scala.io.Source.fromFile("/proc/loadavg").mkString
          .split(" ")(0).toDouble).getOrElse(-1.0)
      val acc = modes.map { case (m, _) => m -> Seq.newBuilder[Double] }.toMap
      var rowsByMode = Map.empty[String, Long]
      var cacheByMode = Map.empty[String, (Long, Long)]
      (1 to runs).foreach { r =>
        modes.foreach { case (mode, build) =>
          spark.catalog.clearCache()
          val (out, _) = build()
          val l = loadavg
          val t0 = System.nanoTime()
          val rows = out.count()
          val s = (System.nanoTime() - t0) / 1e9
          acc(mode) += s
          rowsByMode += mode -> rows
          val stats = org.apache.spark.sql.graftshim.Shim.cachedRddStats(spark)
          cacheByMode += mode -> ((stats.map(_._2).sum, stats.map(_._3).sum))
          println(f"[lshcache-run] dir=$dir mode=$mode run=$r s=$s%.2f load=$l%.1f")
        }
      }
      modes.foreach { case (mode, _) =>
        val (cm, cd) = cacheByMode(mode)
        println(f"[lshcache] dir=$dir mode=$mode rows=${rowsByMode(mode)} " +
          f"s=${median(acc(mode).result())}%.2f " +
          f"cached_mem_mb=${cm / 1e6}%.1f cached_disk_mb=${cd / 1e6}%.1f")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

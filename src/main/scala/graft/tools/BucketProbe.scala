package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/**
 * Characterizes the largest sign-LSH buckets of a corpus — the follow-up
 * probe to SkewBench's round-8 finding that scaled corpora develop
 * ORGANICALLY over-cap buckets at 100 replicas (twin-free generation 4
 * reproduced them, so they are geometry, not the fixed generator bug).
 * For each of the top-k buckets: member count, distinct replica count,
 * distinct source-cluster-label count, and the mean/p10 cosine of
 * members to the bucket's mean direction — separating "a dense cone of
 * genuinely similar vectors" (high mean cosine: the cap is refusing
 * quadratic work on a real near-dup cluster, which is its job) from "a
 * degenerate key" (low mean cosine: the band's planes failed to split
 * an unremarkable cloud — a layout defect).
 *
 * Usage: runMain graft.tools.BucketProbe <sfDir> [topK=5]
 */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val topK = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val embs = graft.Tables.embeddings(spark, sfDir)
    val banded = Similarity.withLshBands(embs,
        planesPerBand = Similarity.ProductionPlanesPerBand)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        (col("vec_id") / lit(ScaleUp.Offset)).cast("long").as("replica"),
        posexplode(col("bands")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      .persist()
    val top = banded.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("n")).orderBy(col("n").desc).limit(topK).collect()

    top.foreach { r =>
      val (band, key, n) = (r.getInt(0), r.getInt(1), r.getLong(2))
      val mem = banded.filter(col("band") === band && col("band_key") === key)
      // bucket mean direction (per-dim average), then cosine of every
      // member to it — computed with the engine's own dot expression
      val dim = 64
      val meanExpr = (0 until dim).map(i =>
        avg(expr(s"CAST(embedding[$i] AS DOUBLE)")).as(s"m$i"))
      val m = mem.agg(meanExpr.head, meanExpr.tail: _*).collect()(0)
      val mean = (0 until dim).map(m.getDouble)
      val mnrm = math.sqrt(mean.map(x => x * x).sum)
      // A (near-)zero mean direction — e.g. a sign-symmetric cluster —
      // would make every cosine NaN/Infinity and silently poison the
      // aggregates; flag the degenerate bucket instead of dividing.
      val Eps = 1e-9
      if (mnrm < Eps) {
        println(s"""{"band":$band,"key":$key,"n":$n,"degenerate_centroid":true}""")
      } else {
        val meanLit = s"array(${mean.mkString(",")})"
        // Members with a (near-)zero norm get a NULL cosine (avg /
        // percentile / min skip NULLs) and are counted separately.
        val stats = mem.select(
            when(col("nrm") > lit(Eps),
              expr(s"aggregate(zip_with(embedding, $meanLit, (a, b) -> CAST(a AS DOUBLE) * b)," +
                " CAST(0 AS DOUBLE), (acc, x) -> acc + x)") / (col("nrm") * lit(mnrm))).as("cosm"),
            col("replica"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("replica")).as("replicas"),
            avg(col("cosm")).as("mean_cos"),
            expr("percentile(cosm, 0.1)").as("p10_cos"),
            min(col("cosm")).as("min_cos"),
            sum(when(col("cosm").isNull, 1).otherwise(0)).as("zero_norm_members")).collect()(0)
        println(s"""{"band":$band,"key":$key,"n":$n,""" +
          s""""replicas":${stats.getLong(1)},""" +
          s""""mean_cos_to_centroid":${"%.3f".format(stats.getDouble(2))},""" +
          s""""p10_cos":${"%.3f".format(stats.getDouble(3))},""" +
          s""""min_cos":${"%.3f".format(stats.getDouble(4))},""" +
          s""""zero_norm_members":${stats.getLong(5)}}""")
      }
    }
    spark.stop()
  }
}

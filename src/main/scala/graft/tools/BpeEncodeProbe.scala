package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Stage split for [[graft.ext.TextAnalysis.bpeEncode]] — the VERDICT r10
 * item-4 protocol (the trainer's BpeTrainProbe methodology applied to the
 * ENCODE composition). bpeEncode is train → driver collect (k rows) →
 * narrow codegen re-encode → explode → vocab-keyed count; the residual
 * ~28× isolated sweep ratio needs attributing to one of those. Phases:
 *
 *   train        bpeTrainMergesCarried(rounds).collect — the whole
 *                iterative trainer, already adjudicated at 14.1× after
 *                the r10 localCheckpoint-free fix
 *   apply_count  bpeApplyMerges(collected merges) → explode → groupBy(tok)
 *                → noop — the decoupled apply path, ONE codegen stage +
 *                the vocab-sized aggregation shuffle
 *   vocab_base   withTokens → explode → groupBy(tok) → noop — the same
 *                pipeline WITHOUT the ApplyBpeMerges rewrite: the floor
 *                any tokenize-and-count pays. apply_count − vocab_base
 *                isolates the merge-rewrite kernel's marginal cost.
 *
 * Each phase runs `reps` times (fresh plan each rep, cache cleared);
 * reported per phase: all rep timings + the min (the least-contaminated
 * statistic, same reasoning as Bench's lower median).
 *
 * Usage: runMain graft.tools.BpeEncodeProbe <sfDir> [rounds=3] [reps=2]
 */
object BpeEncodeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val reps = if (args.length > 2) args(2).toInt else 2
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

    val docs = graft.Tables.documents(spark, sfDir)
    graft.functions.SketchExprs.register(spark)
    // warm-up, mirroring Bench: codegen + classloading off the clock
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timed(phase: String)(f: => Unit): Unit = {
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"phase":"$phase","min":${times.min}%.2f,""" +
        s""""reps":[${times.map(t => f"$t%.2f").mkString(",")}]}""")
    }

    var merges: Seq[(String, String)] = Nil
    timed("train") {
      merges = graft.ext.TextAnalysis.bpeTrainMergesCarried(docs, rounds)
        .orderBy(col("round"))
        .select(col("left_tok"), col("right_tok"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    }
    timed("apply_count") {
      graft.ext.TextAnalysis.bpeApplyMerges(docs, merges)
        .select(explode(col("toks")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .write.format("noop").mode("overwrite").save()
    }
    timed("vocab_base") {
      graft.ext.TextAnalysis.withTokens(docs)
        .select(explode(col("toks")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

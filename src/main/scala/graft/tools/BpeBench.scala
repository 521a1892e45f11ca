package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ext.TextAnalysis

/**
 * Times the two BPE trainer formulations head-to-head on one corpus —
 * the evidence tool for the round-8 sort-carry rework (VERDICT r7
 * item 5): [[TextAnalysis.bpeTrainMerges]] re-shuffles and re-sorts the
 * doc-partitioned stream every round (window chain), while
 * [[TextAnalysis.bpeTrainMergesCarried]] pays the exchange+sort once
 * and runs each round as an in-partition linear scan. Asserts the merge
 * tables are identical before printing timings (a fast wrong trainer is
 * not a result).
 *
 * Usage: runMain graft.tools.BpeBench <sfDir> [rounds=3] [runs=2]
 * Output: one JSON line {"sf_dir":…,"windows_sec":…,"carried_sec":…}
 * (lower median of `runs`).
 */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = graft.Tables.documents(spark, sfDir)
    def run(f: () => org.apache.spark.sql.DataFrame): (Seq[(Int, String, String, Long)], Double) = {
      val t0 = System.nanoTime()
      val rows = f().orderBy("round").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      (rows, (System.nanoTime() - t0) / 1e9)
    }

    // warmup JVM + parquet footer caches on the small spec form inputs
    docs.count()

    val timings = (1 to runs).map { _ =>
      val (w, ws) = run(() => TextAnalysis.bpeTrainMerges(docs, rounds))
      val (c, cs) = run(() => TextAnalysis.bpeTrainMergesCarried(docs, rounds))
      assert(w == c, s"merge tables diverged: windows=$w carried=$c")
      (ws, cs)
    }
    val w = timings.map(_._1).sorted.apply((runs - 1) / 2)
    val c = timings.map(_._2).sorted.apply((runs - 1) / 2)
    println(s"""{"sf_dir":"$sfDir","rounds":$rounds,"runs":$runs,""" +
      s""""windows_sec":${"%.2f".format(w)},"carried_sec":${"%.2f".format(c)}}""")
    spark.stop()
  }
}

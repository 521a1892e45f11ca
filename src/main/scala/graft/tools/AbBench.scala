package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Regression bisector for the round-9 tokenizer/extensions change: runs
 * named SparkEntry queries in a session WITH or WITHOUT GraftExtensions
 * (`GRAFT_EXT=0`), splitting per-query wall into PLAN (optimize + physical
 * planning, `queryExecution.executedPlan` forced) and EXEC (noop write).
 * Usage: GRAFT_EXT=0|1 runMain graft.tools.AbBench <sfDir> <q1,q2,...>
 */
object AbBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val useExt = sys.env.getOrElse("GRAFT_EXT", "1") == "1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val spark = (if (useExt) b.withExtensions(new graft.plans.GraftExtensions) else b)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // warmup full run
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (1 to 2).foreach { i =>
        val df = fn(spark, dir)
        val plan = t { df.queryExecution.executedPlan }
        val exec = t { df.write.format("noop").mode("overwrite").save() }
        spark.catalog.clearCache()
        println(f"[ab] ext=$useExt q=$n run=$i plan_s=$plan%.2f exec_s=$exec%.2f")
        if (i == 1 && sys.env.get("GRAFT_AB_EXPLAIN").contains("1"))
          println(df.queryExecution.optimizedPlan.toString)
      }
    }
    spark.stop()
  }
}

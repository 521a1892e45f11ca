package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-task byte/time vectors for one query's fattest shuffle stages —
  * the drill-down behind a SkewCensus flag: the census reports max/mean,
  * this prints the actual distribution so an adjudication can name the
  * shape (one hot key vs k fat partitions vs uniform-but-coalesced).
  * Usage: runMain graft.tools.SkewProbe <sfDir> <queryName> [topStages=5]
  * GRAFT_AQE=false reruns the same plan without adaptive execution —
  * the differential that separates key concentration (pattern persists)
  * from AQE-coalescing artifacts (pattern dissolves at full width).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val name = args(1)
    val topStages = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SketchExprs.register(spark)
    sys.props("graft.frame.cache.disable") = "1"
    try {
      val stages = SkewCensus.measure(spark) {
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      val mb = 1024.0 * 1024.0
      stages.sortBy(s => -s.bytes.foldLeft(0L)(_ + _)).take(topStages).foreach { s =>
        val tot = s.bytes.foldLeft(0L)(_ + _)
        println(f"stage ${s.stageId}%5d: ${s.tasks}%3d tasks, ${tot / mb}%9.2f MB, " +
          f"skew_b ${SkewCensus.skewOf(s.bytes)}%5.2f skew_t ${SkewCensus.skewOf(s.durMs)}%5.2f")
        println("  bytes_mb: " + s.bytes.sorted.reverse.take(32)
          .map(b => f"${b / mb}%.2f").mkString(" "))
        println("  dur_ms:   " + s.durMs.sorted.reverse.take(32).mkString(" "))
      }
      // where the WALL went: task-time totals per stage (the cost view —
      // a query with 300 tiny stages hides its budget from the bytes view)
      val allTaskMs = stages.map(_.durMs.foldLeft(0L)(_ + _)).foldLeft(0L)(_ + _)
      println(f"\n[by task-time] ${stages.size} stages, total task-time ${allTaskMs / 1000.0}%.1f s")
      stages.sortBy(s => -s.durMs.foldLeft(0L)(_ + _)).take(topStages).foreach { s =>
        val ms = s.durMs.foldLeft(0L)(_ + _)
        println(f"stage ${s.stageId}%5d: ${s.tasks}%3d tasks, ${ms / 1000.0}%8.1f s task-time, " +
          f"${s.bytes.foldLeft(0L)(_ + _) / mb}%8.2f MB, max task ${s.durMs.max / 1000.0}%.1f s")
      }
    } finally {
      sys.props.remove("graft.frame.cache.disable")
      spark.stop()
    }
  }
}

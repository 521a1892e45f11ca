package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Results are materialized through the noop datasource (full pipeline
  * executes, nothing is written) — `count()` would let Catalyst prune
  * payload columns and under-report the real work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR: the one-line JSON contract — WARN noise (WindowExec on the
    // k-row rank window, AQE notices) would bury the result line
    spark.sparkContext.setLogLevel("ERROR")
    // JVM/codegen warm-up so the first timed query doesn't absorb cold-start
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      spark.catalog.clearCache()
      // failures are reported as -1, never as a plausible-looking timing
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The r3 artifact was truncated: the driver tails stdout and the ~2 KB
    // JSON line lost its front to the tail window. Persist the line to a
    // file FIRST (survives any console truncation), then print it on a
    // flushed stream as the one-line stdout contract.
    // resolve + log the absolute destination so an unexpected CWD (and the
    // overwrite of any pre-existing bench.json there) is visible, not silent
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")).toAbsolutePath
    System.err.println(s"[bench] writing result JSON to $out" +
      (if (java.nio.file.Files.exists(out)) " (overwriting existing file)" else ""))
    try java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: ${e.getMessage}") }
    println(json)
    System.out.flush()
    spark.stop()
  }
}

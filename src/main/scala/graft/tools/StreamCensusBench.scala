package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.stream.StreamCensus

/**
 * Measures the incremental dup-gram census at corpus scale (VERDICT r7
 * item 6): ingest the documents table in `batches` forced slices through
 * [[StreamCensus.updateBatch]] — the exact foreachBatch body the
 * streaming attach runs, driven directly so the numbers isolate the
 * census maintenance cost from micro-batch scheduling (engine
 * integration, restart, and re-execution idempotence are StreamingSpec's
 * job) — then verify the final census equals the one-pass batch census
 * ([[graft.ext.Dedup.dupGramCensus]]) row for row, and time that batch
 * census on the same corpus for comparison.
 *
 * The number to watch is the LAST batch's cost: each update shuffles its
 * own batch's gram increments plus one gh-keyed merge with the state
 * frame, so steady-state batch cost must track (batch + state) size and
 * stay far under re-running the batch census per ingestion tick.
 *
 * Usage: runMain graft.tools.StreamCensusBench <sfDir> [batches=5]
 * Output: one JSON line with per-batch seconds, equality, batch-census
 * seconds.
 */
object StreamCensusBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val batches = if (args.length > 1) args(1).toInt else 5
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

    val stateDir = s"/tmp/graft-census-bench-${System.nanoTime()}"
    val docs = graft.Tables.documents(spark, sfDir).persist()
    val n = docs.count() // also warms the JVM + parquet footers

    // contiguous doc_id slices: the append-only ingestion order a real
    // corpus stream would deliver (each doc in exactly one batch)
    val bounds = docs.agg(min(col("doc_id")), max(col("doc_id"))).collect()(0)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val span = (hi - lo + batches) / batches
    val perBatch = (0 until batches).map { b =>
      val slice = docs.filter(col("doc_id") >= lo + b * span &&
        col("doc_id") < lo + (b + 1) * span)
      val t0 = System.nanoTime()
      StreamCensus.updateBatch(stateDir)(slice, b.toLong)
      (System.nanoTime() - t0) / 1e9
    }

    val streamed = StreamCensus.census(spark, stateDir)
    val t0 = System.nanoTime()
    val batchCensus = graft.ext.Dedup.dupGramCensus(docs)
    val batchRows = batchCensus.count()
    val batchSec = (System.nanoTime() - t0) / 1e9
    val diff = streamed.exceptAll(batchCensus).count() +
      batchCensus.exceptAll(streamed).count()

    println(s"""{"sf_dir":"$sfDir","docs":$n,"batches":$batches,""" +
      s""""batch_sec":[${perBatch.map("%.1f".format(_)).mkString(",")}],""" +
      s""""census_rows":$batchRows,"symmetric_diff":$diff,""" +
      s""""one_pass_batch_census_sec":${"%.1f".format(batchSec)}}""")

    scala.util.Using.resource(
        java.nio.file.Files.walk(java.nio.file.Paths.get(stateDir))) { s =>
      s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    spark.stop()
  }
}

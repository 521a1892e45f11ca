package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * A/B for the scrub map: the built-in chained `regexp_replace×3`
 * reference form (three Matcher passes per row, each with a UTF-16
 * round-trip) vs [[graft.functions.ScrubPii]] (three linear byte scans,
 * same values — ScrubSpec pins the parity). The probe is the full
 * q_scrub action shape: project doc_id+scrubbed, noop write.
 *
 * Forms run INTERLEAVED round-by-round (the round-9 LshCachePressure
 * lesson: mode-grouped runs on this host measure load drift, not the
 * code), with one untimed warmup pass per form per dir.
 *
 * Usage: runMain graft.tools.ScrubBench <sfDir> [<sfDir2> ...]
 */
object ScrubBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScrubBench <sfDir> [<sfDir2> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("GRAFT_PROBE_RUNS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    args.foreach { dir =>
      val docs = graft.Tables.documents(spark, dir)
      val nDocs = docs.count()

      def run(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      def newForm() = graft.ext.TextAnalysis.scrub(docs)
      def oldForm() = graft.ext.TextAnalysis.scrubRegex(docs)

      run(newForm()); run(oldForm()) // warmup (JIT + codegen)

      val res = scala.collection.mutable.Map[String, Seq[Double]]().withDefaultValue(Nil)
      (1 to runs).foreach { _ =>
        res("new") :+= timed(run(newForm()))
        res("old") :+= timed(run(oldForm()))
      }
      val load = java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
      val o = median(res("old")); val n = median(res("new"))
      println(f"[scrubbench] dir=$dir docs=$nDocs load=$load%.1f " +
        f"old_s=$o%.3f new_s=$n%.3f speedup=${o / n}%.2fx")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * A/B for the tokenize map floor: the built-in reference form
 * `split(trim(lower(text)), "\\s+")` (per-row regex compile inside
 * `String.split`) vs [[graft.functions.WhitespaceTokens]] (one-pass
 * byte scan, same values — TokenizeSpec pins the parity). Two probes
 * per form:
 *
 *  - `size`: sum(size(toks)) — tokenize only, the pure map cost;
 *  - `explode`: explode + count — tokenize + the generator the real
 *    text queries run (vocab/topk/bpe all explode this stream).
 *
 * Forms run INTERLEAVED round-by-round (the round-9 LshCachePressure
 * lesson: mode-grouped runs on this host measure load drift, not the
 * code), with one untimed warmup pass per form per dir.
 *
 * Usage: runMain graft.tools.TokenBench <sfDir> [<sfDir2> ...]
 */
object TokenBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TokenBench <sfDir> [<sfDir2> ...]")
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

      val newToks = graft.ext.TextAnalysis.withTokens(docs)
      val oldToks = docs.withColumn("toks", graft.ext.TextAnalysis.splitTokens("text"))

      def sizeRun(df: org.apache.spark.sql.DataFrame): Unit =
        df.agg(sum(size(col("toks")))).head()
      def explodeRun(df: org.apache.spark.sql.DataFrame): Unit =
        df.select(explode(col("toks")).as("token")).count()

      // warmup both forms (JIT + codegen)
      sizeRun(newToks); sizeRun(oldToks); explodeRun(newToks); explodeRun(oldToks)

      // third probe: InferFiltersFromGenerate synthesizes
      // `size(tokenize(text))>0 AND isnotnull(tokenize(text))` BELOW the
      // project, so every explode path tokenizes each doc TWICE (filter +
      // project; codegen CSE only dedups within one operator). The rule
      // exists to prune rows that generate nothing — on a documents table
      // that's a no-op. Measure the explode with the rule excluded.
      val inferRule = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
      def explodeNoInfer(df: org.apache.spark.sql.DataFrame): Unit = {
        spark.conf.set("spark.sql.optimizer.excludedRules", inferRule)
        try explodeRun(df)
        finally spark.conf.unset("spark.sql.optimizer.excludedRules")
      }
      explodeNoInfer(newToks) // warmup

      val res = scala.collection.mutable.Map[String, Seq[Double]]().withDefaultValue(Nil)
      (1 to runs).foreach { _ =>
        res("size_new") :+= timed(sizeRun(newToks))
        res("size_old") :+= timed(sizeRun(oldToks))
        res("explode_new") :+= timed(explodeRun(newToks))
        res("explode_old") :+= timed(explodeRun(oldToks))
        res("explode_new_noinfer") :+= timed(explodeNoInfer(newToks))
      }
      val load = java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
      val so = median(res("size_old")); val sn = median(res("size_new"))
      val eo = median(res("explode_old")); val en = median(res("explode_new"))
      val eni = median(res("explode_new_noinfer"))
      println(f"[tokbench] dir=$dir docs=$nDocs load=$load%.1f " +
        f"size_old_s=$so%.3f size_new_s=$sn%.3f size_speedup=${so / sn}%.2fx " +
        f"explode_old_s=$eo%.3f explode_new_s=$en%.3f explode_speedup=${eo / en}%.2fx " +
        f"explode_new_noinfer_s=$eni%.3f noinfer_speedup=${en / eni}%.2fx")
    }
    spark.stop()
  }
}

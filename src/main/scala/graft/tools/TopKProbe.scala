package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Stage census for q_spacesaving_topk — the round-8 sweep's worst ratio
 * (37.1× wall-clock at 100× data). The query is a single global typed
 * aggregate over the exploded token stream, so there are only two stages
 * that can carry the growth:
 *
 *  - the MAP floor: tokenize + explode + count the token stream — the
 *    cost any aggregate over tokens pays before the aggregator sees a
 *    row (pure codegen'd work, expected ~linear in tokens);
 *  - the AGGREGATE: the same stream through [[graft.ext.SpaceSavingTopK]]
 *    (per-token `offer` into the bounded state + one partial merge per
 *    partition pair).
 *
 * Per dir it prints docs, tokens, both medians, and the derived
 * per-token aggregator overhead in ns — `(agg − map) / tokens`. A FLAT
 * per-token overhead across SFs means the sweep ratio is map-work
 * amortization (the sf0.1 base run is dominated by fixed job overhead),
 * i.e. the expected shape for a bounded-state aggregate; a GROWING
 * per-token overhead means the state maintenance is superlinear — a
 * plan/code defect.
 *
 * Usage: runMain graft.tools.TopKProbe <sfDir> [<sfDir2> ...]
 */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TopKProbe <sfDir> [<sfDir2> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("GRAFT_PROBE_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    args.foreach { dir =>
      val docs = graft.Tables.documents(spark, dir)
      val nDocs = docs.count()
      val toks = graft.ext.TextAnalysis.withTokens(docs)
        .select(expr("explode(toks)").as("token"))
      val nToks = toks.count()
      // one untimed pass of BOTH stages first: JIT + codegen warmup
      // otherwise lands entirely on the first dir's first measurement
      toks.count()
      toks.as[String]
        .select(new graft.ext.SpaceSavingTopK(10, 4096, strict = true)
          .toColumn.name("topk")).head()
      // measure the two stages interleaved so machine-load drift hits both
      val mapS = Seq.newBuilder[Double]
      val aggS = Seq.newBuilder[Double]
      (1 to runs).foreach { _ =>
        mapS += timed { toks.count() }
        aggS += timed {
          toks.as[String]
            .select(new graft.ext.SpaceSavingTopK(10, 4096, strict = true)
              .toColumn.name("topk"))
            .head()
        }
      }
      val (m, a) = (median(mapS.result()), median(aggS.result()))
      val perTokNs = (a - m) * 1e9 / nToks
      println(f"[topkprobe] dir=$dir docs=$nDocs tokens=$nToks " +
        f"map_s=$m%.2f agg_s=$a%.2f agg_overhead_ns_per_token=$perTokNs%.1f")
    }
    spark.stop()
  }
}

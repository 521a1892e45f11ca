package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Scratch diagnostic for the fat-shuffle lineage census: prints every
  * ShuffleExchange's output schema for one query so the taint rules can
  * be checked against the real plan. Mimics the ScaleSpec pin's flow:
  * a default-conf session, then conf.set overrides + clearCache before
  * planning — the same path the shared test session takes. */
object FatProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val q = if (args.length > 1) args(1) else "q_embed_neardup_lsh"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.props("graft.frame.cache.disable") = "1"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.catalog.clearCache()
    // simulate the census loop: construct every earlier query first so
    // cache-manager reuse across queries matches the test's state
    if (args.length > 2 && args(2) == "loop")
      graft.SparkEntry.queries.toSeq.sortBy(_._1).takeWhile(_._1 < q)
        .foreach { case (n, fn) =>
          val c = PlanAudit.fatShuffled(fn(spark, dir).queryExecution.executedPlan)
          if (c.nonEmpty) println(s"$n census=$c")
        }
    val plan = graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
    val nodes = PlanAudit.allNodes(plan)
    println(s"=== $q: ${nodes.size} nodes, census=${PlanAudit.fatShuffled(plan)}")
    nodes.foreach {
      case x: ShuffleExchangeExec =>
        println(s"SHUFFLE out=${x.output.map(a => s"${a.name}#${a.exprId.id}:${a.dataType.simpleString.take(20)}").mkString(", ")}")
      case n =>
        println(s"${n.getClass.getSimpleName} out=${n.output.map(a => s"${a.name}#${a.exprId.id}").take(8).mkString(", ")}")
    }
    spark.stop()
  }
}

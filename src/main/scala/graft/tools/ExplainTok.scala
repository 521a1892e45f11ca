package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan audit for codegen spans: prints the formatted plan and the
  * EXECUTED plan (after running it — the `*(n)` stars mark the
  * WholeStageCodegen spans; a CodegenFallback project would break them).
  * With no query name, audits the WhitespaceTokens tokenize+explode+count
  * path; with one, audits that registered [[graft.SparkEntry]] query.
  * Usage: runMain graft.tools.ExplainTok <sfDir> [queryName] */
object ExplainTok {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = if (args.length > 1) graft.SparkEntry.queries(args(1))(spark, args(0))
    else {
      val docs = graft.Tables.documents(spark, args(0))
      graft.ext.TextAnalysis.withTokens(docs)
        .select(explode(col("toks")).as("token"))
        .groupBy(col("token")).count()
    }
    q.explain("formatted")
    val qe = q.queryExecution
    qe.toRdd.count()
    println(qe.executedPlan.toString)
    spark.stop()
  }
}

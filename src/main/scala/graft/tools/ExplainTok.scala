package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan audit for the WhitespaceTokens path: prints the formatted plan of
  * a tokenize+explode+count over `documents` so the WholeStageCodegen
  * span (and the absence of a CodegenFallback project) can be eyeballed.
  * Usage: runMain graft.tools.ExplainTok <sfDir> */
object ExplainTok {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, args(0))
    val q = graft.ext.TextAnalysis.withTokens(docs)
      .select(explode(col("toks")).as("token"))
      .groupBy(col("token")).count()
    q.explain("formatted")
    // run it, then print the executed plan: the `*(n)` stars mark the
    // WholeStageCodegen spans (a CodegenFallback project would break them)
    val qe = q.queryExecution
    qe.toRdd.count()
    println(qe.executedPlan.toString)
    spark.stop()
  }
}

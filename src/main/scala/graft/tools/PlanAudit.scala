package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/**
 * Registry-wide plan-shape inventory: for every `SparkEntry.queries` entry,
 * plan it against the given sf dir and print one JSON line naming
 *   - physical CartesianProductExec nodes (should never exist),
 *   - physical BroadcastNestedLoopJoinExec nodes (legitimate only for the
 *     documented broadcast-1-row scalar/codebook cross joins),
 *   - interpreted (CodegenFallback) expressions anywhere in the physical
 *     plan (engine expressions are all real-codegen since r9; a builtin
 *     or future expression regressing to fallback de-pipelines its
 *     WholeStageCodegen span).
 * The committed ScaleSpec audit pins the discovered population; this tool
 * exists to (re-)discover it when the spec's allowlist fails.
 * Usage: runMain graft.tools.PlanAudit <sfDir>
 */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        // sparkPlan = physical plan before AQE wrapping: fully traversable
        val plan: SparkPlan = fn(spark, dir).queryExecution.sparkPlan
        val cartesian = plan.collect { case c: CartesianProductExec => c }
        val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
        val fallback = plan.flatMap(node => node.expressions.flatMap(_.collect {
          case e: CodegenFallback =>
            val n = e.getClass.getSimpleName
            if (n.nonEmpty) n else e.getClass.getName
        })).distinct.sorted
        if (cartesian.nonEmpty || bnlj.nonEmpty || fallback.nonEmpty)
          println(s"""{"q":"$name","cartesian":${cartesian.size},""" +
            s""""bnlj":${bnlj.size},""" +
            s""""fallback":${fallback.map("\"" + _ + "\"").mkString("[", ",", "]")}}""")
      } catch {
        case e: Exception => println(s"""{"q":"$name","err":"${e.getClass.getSimpleName}"}""")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
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
 *     WholeStageCodegen span),
 *   - fat columns (documents.text, embeddings.embedding) read at a parquet
 *     scan, and — the 100 TB hazard — carried THROUGH a ShuffleExchange.
 *     The fat_shuffle census is DIAGNOSTIC ONLY, not pinned in ScaleSpec:
 *     at small sf the planner broadcasts the bucket joins (hiding the
 *     shuffle a big sf would take), and operators that rename the column
 *     (emb1/emb2 in the LSH pair join) evade the name match.
 * Run with -Dgraft.frame.cache.disable=1 to see the real computation
 * pipelines instead of warm FrameCache memo scans.
 * The committed ScaleSpec audit pins the discovered population; this tool
 * exists to (re-)discover it when the spec's allowlist fails.
 * Usage: runMain graft.tools.PlanAudit <sfDir>
 */
object PlanAudit {

  /** Every node of `p` INCLUDING the plans behind the two leaf-node
    * curtains `collect` stops at: InMemoryTableScanExec (persist()
    * boundaries — e.g. the LSH bands frame hides its band exchange there)
    * and AdaptiveSparkPlanExec (AQE wraps cached subtrees in their own
    * adaptive root, and `sparkPlan` children may carry one too). Subquery
    * plans are not chased: the engine's scalar-bounds pattern is
    * crossJoin(broadcast(...)), never a subquery expression. */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p.collect { case n => n }
    here ++ here.flatMap {
      case imts: InMemoryTableScanExec => allNodes(imts.relation.cachedPlan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.inputPlan)
      case _ => Nil
    }
  }

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
        val nodes = allNodes(fn(spark, dir).queryExecution.sparkPlan)
        val cartesian = nodes.collect { case c: CartesianProductExec => c }
        val bnlj = nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
        val fallback = nodes.flatMap(node => node.expressions.flatMap(_.collect {
          case e: CodegenFallback =>
            val n = e.getClass.getSimpleName
            if (n.nonEmpty) n else e.getClass.getName
        })).distinct.sorted
        val fat = nodes.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.output.map(_.name).filter(c => c == "text" || c == "embedding")
        }.flatten.distinct.sorted
        val fatShuffle = nodes.collect {
          case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            x.output.map(_.name).filter(c => c == "text" || c == "embedding")
        }.flatten.distinct.sorted
        if (cartesian.nonEmpty || bnlj.nonEmpty || fallback.nonEmpty ||
            fat.nonEmpty || fatShuffle.nonEmpty)
          println(s"""{"q":"$name","cartesian":${cartesian.size},""" +
            s""""bnlj":${bnlj.size},""" +
            s""""fallback":${fallback.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
            s""""fat":${fat.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
            s""""fat_shuffle":${fatShuffle.map("\"" + _ + "\"").mkString("[", ",", "]")}}""")
      } catch {
        case e: Exception => println(s"""{"q":"$name","err":"${e.getClass.getSimpleName}"}""")
      }
    }
    spark.stop()
  }
}

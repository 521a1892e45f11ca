package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Conversion-funnel analysis (A4/A12, stream_processor.py:186-229).
 *
 * Reference semantics quirk, reproduced deliberately: a session counts for a
 * step if the step's event is *present* in the session — step ORDER IS NOT
 * ENFORCED despite the docstring claiming an ordered list (SURVEY.md §2.3 A4,
 * FIXTURES.md §5). A session `[transaction, view]` increments both steps.
 */
object Funnel {

  /** Per-session step flags (0/1 int per step, via array_contains). */
  def sessionFlags(sessionized: DataFrame, steps: Seq[String]): DataFrame = {
    val base = sessionized
      .groupBy(col("visitorid"), col("session_id"))
      .agg(collect_list(col("event")).as("events"))
    steps.foldLeft(base) { (df, step) =>
      df.withColumn(step,
        when(array_contains(col("events"), step), 1).otherwise(0))
    }
  }

  /**
   * Global funnel counts: one row, one column per step = number of sessions
   * containing that step (A12 grand-total agg, stream_processor.py:214-216).
   * Column names are `n_<step>` (aliased identically in the oracle SQL).
   */
  def counts(sessionized: DataFrame, steps: Seq[String]): DataFrame = {
    val flags = sessionFlags(sessionized, steps)
    flags.agg(
      sum(col(steps.head)).as(s"n_${steps.head}"),
      steps.tail.map(s => sum(col(s)).as(s"n_$s")): _*)
  }

  /**
   * Stream-mode variant with the reference's provenance columns
   * (batch_id + analysis_time, stream_processor.py:219-221). Not
   * oracle-checkable (current_timestamp), used by the streaming job.
   */
  def countsWithProvenance(sessionized: DataFrame, steps: Seq[String], batchId: Long): DataFrame =
    counts(sessionized, steps)
      .withColumn("batch_id", lit(batchId))
      .withColumn("analysis_time", current_timestamp())
}

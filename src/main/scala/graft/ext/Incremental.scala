package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Incremental rollup maintenance: the re-aggregable partial-state pattern
 * that turns a 100 TB daily ETL into a scan of ONLY the newly-arrived
 * partition.
 *
 * The rollup state is kept in ALGEBRAIC form — per group: row count,
 * decimal sum, min, max. Every one of those merges associatively, so
 *
 *   rollup(all data) == merge(rollup(history), rollup(today's delta))
 *
 * holds EXACTLY (decimal sums are order-independent; count/min/max
 * trivially so). A nightly job therefore folds the new partition into the
 * stored state at delta cost; non-mergeable outputs (averages) are derived
 * from the state at read time, never stored. This is the batch analogue of
 * the streaming sketches (CMS, space-saving): state you can always merge.
 *
 * [[eventRollupIncremental]] proves the identity end-to-end: it computes
 * history and delta rollups separately (split at a date cutoff) and merges
 * them; the oracle computes the rollup over all rows in one pass. A hash
 * mismatch of even one decimal digit would fail the gate.
 */
object Incremental {

  /** Algebraic per-(event_type, day) state of the events table. */
  def eventRollup(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        to_date(expr(Tables.eventTimeExpr)).as("day"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Merge any number of algebraic rollup states (same schema). */
  def mergeRollups(states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_value")).as("sum_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))

  /** History ⊕ delta == full, demonstrated on the events table with a mid-
    * range cutoff; emits derived columns (avg) from state at read time. */
  def eventRollupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    // one 1-row scalar agg on a pruned column: the cutoff lands as a
    // LITERAL in both branch filters so each split predicate pushes into
    // the parquet scan. The merge identity holds for ANY disjoint split,
    // so the cutoff value itself needs no cross-engine determinism.
    // avg over zero rows is NULL — cutoff 0 makes history empty and delta
    // the (empty) whole, so the merge identity still holds on an empty table
    val cutoffRow = e.agg(expr("CAST(avg(ts DIV 1000000000) AS LONG)")).head()
    val cutoff = if (cutoffRow.isNullAt(0)) 0L else cutoffRow.getLong(0)
    val history = eventRollup(e.filter(col("ts") <  lit(cutoff) * lit(1000000000L)))
    val delta   = eventRollup(e.filter(col("ts") >= lit(cutoff) * lit(1000000000L)))
    mergeRollups(history, delta)
      .select(col("event_type"), col("day"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"),
        (col("sum_value").cast("double") / col("n_events")).as("avg_value"),
        col("min_value"), col("max_value"))
  }
}

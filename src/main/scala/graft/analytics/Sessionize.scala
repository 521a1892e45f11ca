package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization — the flagship operator of the reference
 * (compute_sessionization, stream_processor.py:79-138):
 *
 *   W1  window (partition by visitor, order by event time)
 *   W2  lag(event_time)                         → prev_event_time
 *   W3  unix_timestamp diff                     → diff_seconds
 *   W4  boundary predicate (null prev OR gap > 1800 s, strict `>`)
 *   W5  running sum of boundaries over rows-unbounded-preceding frame
 *   W6  session_id = concat_ws("_", visitorid, session_number)
 *
 * Scale notes (100 TB): one shuffle on `visitorid` + an in-partition sort —
 * `WindowExec` already does partial spill; skewed visitors (bots) are the
 * only hazard and are bounded per-visitor, not per-dataset. Every consumer
 * of the sessionized frame shares the single shuffle (callers should
 * `.persist()` when fanning out — the reference recomputed it 3×,
 * stream_processor.py:394-396).
 *
 * Determinism note: the reference orders only by event_time; ties would make
 * lag/sum nondeterministic. We add a stable tiebreak column (default
 * `itemid`) to both the engine and the oracle — a no-op when timestamps are
 * unique, deterministic when they are not.
 */
object Sessionize {

  /**
   * Inter-event gap histogram — the tuning evidence behind the session
   * gap threshold: per capped minute bucket, the count and share of all
   * within-visitor gaps. Buckets are pure integer arithmetic
   * (`least(diff DIV 60, cap)` — no log, no float bucketing drift); the
   * share is one IEEE division of exact counts. One hash agg over the
   * sessionize family's shared window pass + a 1-row broadcast total.
   */
  def gapHistogram(sessionized: DataFrame, capMinutes: Int = 60): DataFrame = {
    val buckets = sessionized
      .filter(col("diff_seconds").isNotNull)
      .groupBy(expr(s"CAST(LEAST(diff_seconds DIV 60, $capMinutes) AS INT)")
        .as("gap_minutes"))
      .agg(count(lit(1)).as("n_gaps"))
    buckets
      .crossJoin(broadcast(buckets.agg(sum(col("n_gaps")).as("total"))))
      .withColumn("share",
        col("n_gaps").cast("double") / col("total").cast("double"))
      .select("gap_minutes", "n_gaps", "share")
  }

  val DefaultGapSeconds = 1800L

  /**
   * Event-grain sessionized frame: input columns + prev_event_time,
   * diff_seconds, is_new_session, session_number, session_id.
   * Mirrors the return of compute_sessionization (stream_processor.py:138).
   */
  def apply(events: DataFrame,
            gapSeconds: Long = DefaultGapSeconds,
            tiebreak: String = "itemid"): DataFrame = {
    val w = Window.partitionBy(col("visitorid"))
      .orderBy(col("event_time"), col(tiebreak))
    val wRunning = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    events
      .withColumn("prev_event_time", lag(col("event_time"), 1).over(w))
      .withColumn("diff_seconds",
        unix_timestamp(col("event_time")) - unix_timestamp(col("prev_event_time")))
      .withColumn("is_new_session",
        when(col("prev_event_time").isNull, 1)
          .when(col("diff_seconds") > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_number", sum(col("is_new_session")).over(wRunning))
      .withColumn("session_id", concat_ws("_", col("visitorid"), col("session_number")))
  }

  /**
   * Session-metrics aggregate (A1, stream_processor.py:117-136): one row per
   * session with start/end/count and wall-clock length in whole seconds.
   */
  def sessionMetrics(sessionized: DataFrame): DataFrame =
    sessionized
      .groupBy(col("session_id"), col("visitorid"))
      .agg(
        min(col("event_time")).as("session_start"),
        max(col("event_time")).as("session_end"),
        count(lit(1)).as("events_in_session"))
      .withColumn("session_length",
        unix_timestamp(col("session_end")) - unix_timestamp(col("session_start")))
}

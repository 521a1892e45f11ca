package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cohort retention over the clickstream: visitors grouped by first-seen
 * day, activity counted per (cohort, day) — the standard retention
 * triangle the reference's per-minute analyses stop short of
 * (stream_processor.py:186-398 has per-minute actives but no cohorting).
 *
 * Scale shape: two aggregations over the events scan (first-seen per
 * visitor, distinct activity days) that share the visitorid shuffle key,
 * joined on visitorid, then reduced to the tiny (cohort, day) matrix.
 * `n_active` is exact-distinct per cell; at 100 TB switch the final
 * countDistinct to the HLL rewrite (`spark.graft.approxDistinct.enabled`)
 * — cells become mergeable sketches instead of exact shuffles.
 */
object Cohorts {

  /** (cohort_day, activity_day, n_active, day_offset) retention matrix. */
  def retention(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy(col("visitorid"))
      .agg(min(col("event_time")).as("first_time"))
      .select(col("visitorid"), to_date(col("first_time")).as("cohort_day"))
    val activity = events
      .select(col("visitorid"), to_date(col("event_time")).as("activity_day"))
      .distinct()
    activity.join(firstSeen, "visitorid")
      .groupBy(col("cohort_day"), col("activity_day"))
      .agg(countDistinct(col("visitorid")).as("n_active"))
      .withColumn("day_offset", datediff(col("activity_day"), col("cohort_day")))
  }

  /**
   * New-vs-returning split per day — the top-of-dashboard acquisition
   * metric: a visitor is "new" on their first-seen day, "returning" on
   * any later active day. Same two visitorid-keyed aggregations as
   * [[retention]] (shared shuffle key), reduced to one row per day; the
   * conditional sum is algebraic (map-side combinable).
   */
  def newVsReturning(events: DataFrame): DataFrame = {
    val firstDay = events.groupBy(col("visitorid"))
      .agg(min(to_date(col("event_time"))).as("first_day"))
    val dayVisitors = events
      .select(to_date(col("event_time")).as("day"), col("visitorid"))
      .distinct()
    dayVisitors.join(firstDay, "visitorid")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active_visitors"),
        sum(when(col("first_day") === col("day"), 1L).otherwise(0L)).as("new_visitors"))
      .withColumn("returning_visitors", col("active_visitors") - col("new_visitors"))
  }
}

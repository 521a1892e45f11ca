package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Per-session ordered user journey (A2/A3, stream_processor.py:141-183).
 *
 * The reference's ordering trick is load-bearing: it collects
 * `struct(event_time, event)` and relies on `array_sort` comparing structs
 * field-by-field — event_time first, event as tiebreak (SURVEY.md §2.4/§7.4).
 * We preserve exactly that: collect → array_sort → project `.event`.
 *
 * Scale notes: `collect_list` is bounded per (visitor, session); pathological
 * sessions are capped by [[userPathsCapped]] which `slice`s the sorted array —
 * the reference has no guard (SURVEY.md §7.4 risk 7).
 */
object UserPaths {

  /** visitorid, session_id, user_path array<string> ordered by (event_time, event). */
  def apply(sessionized: DataFrame): DataFrame =
    sessionized
      .groupBy(col("visitorid"), col("session_id"))
      .agg(collect_list(struct(col("event_time"), col("event"))).as("events"))
      .withColumn("ordered_events", array_sort(col("events")))
      .withColumn("user_path", expr("transform(ordered_events, x -> x.event)"))
      .select("visitorid", "session_id", "user_path")

  /** Same, but keep at most `maxEvents` of each path (bot guard). */
  def userPathsCapped(sessionized: DataFrame, maxEvents: Int = 1000): DataFrame =
    apply(sessionized).withColumn("user_path", slice(col("user_path"), 1, maxEvents))

  /** Paths flattened to a `'>'`-joined string — the serialization-friendly
    * form (array columns don't survive every downstream consumer; the
    * driver's pandas-based compare is one such). */
  def joined(sessionized: DataFrame, sep: String = ">"): DataFrame =
    apply(sessionized).withColumn("user_path", concat_ws(sep, col("user_path")))
}

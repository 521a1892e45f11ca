package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Item-centric analyses (A9–A11, stream_processor.py:315-379) plus the
 * true top-k the reference's `top_items` name promises but never delivers
 * (SURVEY.md §2.3 A9 — no ranking/limit in the reference).
 */
object Items {

  /** A9: interactions per (minute, item) — full table, reference parity. */
  def topItemsPerMinute(events: DataFrame): DataFrame =
    events
      .withColumn("minute", date_trunc("minute", col("event_time")))
      .groupBy(col("minute"), col("itemid"))
      .agg(count(lit(1)).as("interactions"))

  /**
   * Extension: actual top-k per minute. Aggregation first (shrinks the data
   * before the window shuffle), then rank with a deterministic tiebreak.
   * At scale this is the standard agg→window top-k; k is tiny so the window
   * buffer is bounded.
   */
  def topItemsRanked(events: DataFrame, k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("minute"))
      .orderBy(col("interactions").desc, col("itemid").asc)
    topItemsPerMinute(events)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /**
   * Top-k per minute via the map-side-combinable exact Aggregator
   * ([[graft.ext.GroupedTopK]]) — result-identical to [[topItemsRanked]]
   * (same total order) but with NO per-group sort: after the (minute,
   * item) count, each map task forwards at most k entries per minute and
   * the merge keeps k. The window form shuffles and sorts every counted
   * row per minute; at 100 TB that difference is the whole game.
   */
  def topItemsAgg(events: DataFrame, k: Int = 5): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    topItemsPerMinute(events)
      .select(col("minute"), col("itemid"), col("interactions"))
      .as[(java.time.LocalDateTime, String, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new graft.ext.GroupedTopK(k).toColumn.name("top"))
      .flatMap { case (minute, top) =>
        top.zipWithIndex.map { case ((item, n), i) => (minute, item, n, i + 1) }
      }
      .toDF("minute", "itemid", "interactions", "rank")
      .withColumn("rank", col("rank").cast("int"))
  }

  /** A10: global interaction counts per item. */
  def itemInteractions(events: DataFrame): DataFrame =
    events
      .groupBy(col("itemid"))
      .agg(count(lit(1)).as("interaction_count"))

  /**
   * A10 under key skew: two-phase salted aggregation. Phase 1 counts on
   * (itemid, salt) — spreading a hot item over `saltBuckets` reducers —
   * phase 2 merges the partials. Same result as [[itemInteractions]]
   * (verified against the same oracle); the pattern matters when one item
   * dominates (bot traffic) and a single reducer would bottleneck.
   * (Plain Spark partial aggregation already map-side-combines; explicit
   * salting is for when the SECOND phase's single key is still too hot,
   * e.g. under `collect_list`-style aggregates that can't partial-merge.)
   */
  def itemInteractionsSalted(events: DataFrame, saltBuckets: Int = 16): DataFrame =
    events
      .withColumn("salt", pmod(crc32(col("visitorid")), lit(saltBuckets)))
      .groupBy(col("itemid"), col("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("itemid"))
      .agg(sum(col("partial")).cast("long").as("interaction_count"))

  /** A11: view-only counts per item (filter pushed below the aggregate). */
  def mostViewedItems(events: DataFrame, viewEvent: String = "view"): DataFrame =
    events
      .filter(col("event") === viewEvent)
      .groupBy(col("itemid"))
      .agg(count(lit(1)).as("view_count"))
}

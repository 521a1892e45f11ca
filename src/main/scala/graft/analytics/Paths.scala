package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Path-mining extensions over the sessionized clickstream — the natural
 * next step after the reference's per-session journey collection
 * (stream_processor.py:141-183 builds ordered user paths; these operators
 * mine them): a first-order Markov transition model between event types
 * and the most frequent within-session event n-grams.
 *
 * Scale shape: the transition model is one window pass (same
 * (visitorid, session_id)-partitioned sort every sessionize query already
 * shares) followed by a hash aggregate whose cardinality is
 * |event_types|² — tiny regardless of input size, so the final
 * probability window runs on a few dozen rows. Trigram mining explodes
 * each session path once (output rows = events − 2·sessions) and
 * aggregates on the trigram string; the top-k is a
 * TakeOrderedAndProject, never a global sort.
 */
object Paths {

  /**
   * First-order Markov transitions between event types within a session:
   * for each (event → next_event) pair, the transition count and the
   * conditional probability P(next | current).
   *
   * `prob` is one IEEE division of two exact integers — correctly rounded
   * and therefore bit-identical across engines (the q_priority_sample
   * determinism rule: no libm, single correctly-rounded op).
   */
  def eventTransitions(sessionized: DataFrame): DataFrame = {
    // same deterministic in-session order as the sessionize family:
    // event_time with the unique itemid surrogate as tiebreak
    val w = Window.partitionBy(col("visitorid"), col("session_id"))
      .orderBy(col("event_time"), col("itemid"))
    sessionized
      .withColumn("next_event", lead(col("event"), 1).over(w))
      .filter(col("next_event").isNotNull)
      .groupBy(col("event"), col("next_event"))
      .agg(count(lit(1)).as("transitions"))
      // |event_types|² rows at most — this window is driver-trivial but
      // keeps the whole computation one declarative plan (no collect)
      .withColumn("prob",
        col("transitions").cast("double") /
          sum(col("transitions")).over(Window.partitionBy(col("event"))).cast("double"))
      .select("event", "next_event", "transitions", "prob")
  }

  /**
   * Top-k most frequent within-session event-type trigrams ("view>view>
   * addtocart"), the classic path-mining summary. Sessions shorter than 3
   * events contribute nothing. Ties at the k boundary break on the trigram
   * string so the result set is deterministic.
   */
  def pathTrigrams(sessionized: DataFrame, k: Int = 20): DataFrame =
    UserPaths(sessionized)
      .select(explode(expr(
        """CASE WHEN size(user_path) < 3 THEN array()
          | ELSE transform(sequence(1, size(user_path) - 2), i ->
          |   concat_ws('>', element_at(user_path, i),
          |     element_at(user_path, i + 1), element_at(user_path, i + 2)))
          | END""".stripMargin)).as("trigram"))
      .groupBy(col("trigram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("trigram"))
      .limit(k)
}

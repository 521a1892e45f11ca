package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.CacheScope.TrackedPersist

/**
 * Item co-occurrence with lift — the item-to-item collaborative-filtering
 * primitive over the event stream (the reference's item analyses,
 * stream_processor.py:306-330, stop at per-item counts; co-occurrence is
 * the pairwise extension every recommender bootstrap needs). "Item" here
 * is the integer `props.k` attribute of the raw events table.
 *
 * Scale shape: the pair join is keyed on user_id over the DISTINCT
 * (user, item) set, so per-user work is |items-per-user|² — bounded by
 * `maxItemsPerUser` (deterministic keep-smallest-k guard against bot
 * users; the same role as Dedup's bucket caps). The item-total and
 * user-count sides are tiny aggregates, broadcast — the big frame is
 * scanned once. Determinism: `lift` is one IEEE division of two exact
 * integer products (both ≤ n_users² ≤ 2^63 for any realistic corpus).
 * The distinct (user, item) frame is persisted for its three consumers;
 * cache lifetime is caller-owned (the [[graft.ext.SparseSim]] contract).
 */
object Cooccur {

  /**
   * Distinct (user_id, k) pairs from events' JSON props, capped per user.
   * The cap keeps the smallest item ids — an arbitrary-but-deterministic
   * rule, mirrored in the oracle.
   */
  def userItems(events: DataFrame, maxItemsPerUser: Int = 1000): DataFrame =
    events
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
      .distinct()
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("user_id")).orderBy(col("k"))))
      .filter(col("rn") <= maxItemsPerUser)
      .drop("rn")

  /**
   * (k1 < k2, both_users, users1, users2, lift) for item pairs co-occurring
   * in at least `minUsers` users' event histories.
   * lift = P(k1,k2) / (P(k1)·P(k2)) = both·N / (users1·users2).
   */
  def itemCooccurrence(events: DataFrame, minUsers: Long = 2,
                       maxItemsPerUser: Int = 1000): DataFrame = {
    // both the totals and the self-join consume this; persist so the JSON
    // extraction + distinct runs once
    val uk = userItems(events, maxItemsPerUser).persistTracked()
    val totals = uk.groupBy(col("k")).agg(count(lit(1)).as("users"))
    val nUsers = uk.agg(countDistinct(col("user_id")).as("n_users"))
    uk.select(col("user_id"), col("k").as("k1"))
      .join(uk.select(col("user_id"), col("k").as("k2")), "user_id")
      .filter(col("k1") < col("k2"))
      .groupBy(col("k1"), col("k2"))
      .agg(count(lit(1)).as("both_users"))
      .filter(col("both_users") >= minUsers)
      .join(broadcast(totals.select(col("k").as("k1"), col("users").as("users1"))), "k1")
      .join(broadcast(totals.select(col("k").as("k2"), col("users").as("users2"))), "k2")
      .crossJoin(broadcast(nUsers))
      .withColumn("lift",
        (col("both_users") * col("n_users")).cast("double") /
          (col("users1") * col("users2")).cast("double"))
      .select("k1", "k2", "both_users", "users1", "users2", "lift")
  }
}

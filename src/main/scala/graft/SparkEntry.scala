package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics._
import graft.clean.CleanStage
import graft.relational.Relational
import graft.schema.Schemas

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is registered here as a
  * `(SparkSession, sfDir) => DataFrame` with an equivalent DuckDB oracle in
  * [[oracleSql]]. Column names and types are aligned on both sides because
  * the driver's compare sorts columns by name and hashes values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Sessionization + session metrics — scan, projection, cast, window
    * (lag + running sum), conditional, concat, groupBy-agg in one plan. */
  def entry(spark: SparkSession): DataFrame =
    Sessionize.sessionMetrics(
      Sessionize(Tables.clickstream(spark, "/root/testdata/sf0.001")))

  // ---------------------------------------------------------------------------
  // Spark-side query functions
  // ---------------------------------------------------------------------------

  private def cs(s: SparkSession, dir: String): DataFrame = Tables.clickstream(s, dir)
  private def sess(s: SparkSession, dir: String): DataFrame = Sessionize(cs(s, dir))
  private val steps = Schemas.testdataFunnelSteps

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- clean stage (NiFi tier collapsed, SURVEY §3.3) --
    "q_clean_enrich" -> ((s, d) => CleanStage.enrichTyped(cs(s, d))),
    // -- sessionization family (SURVEY §2.4, flagship) --
    "q_sessionize" -> ((s, d) => sess(s, d).select(
      "visitorid", "event_time", "event", "itemid", "prev_event_time",
      "diff_seconds", "is_new_session", "session_number", "session_id")),
    "q_sessions" -> ((s, d) => Sessionize.sessionMetrics(sess(s, d))),
    "q_user_paths" -> ((s, d) => UserPaths(sess(s, d))),
    "q_funnel" -> ((s, d) => Funnel.counts(sess(s, d), steps)),
    // -- per-minute family (A5-A8) --
    "q_events_per_minute" -> ((s, d) => MinuteStats.eventsPerMinute(cs(s, d))),
    "q_active_users" -> ((s, d) => MinuteStats.activeUsers(cs(s, d))),
    "q_event_type_distribution" -> ((s, d) => MinuteStats.eventTypeDistribution(cs(s, d))),
    "q_bounce_rate" -> ((s, d) => MinuteStats.bounceRate(cs(s, d))),
    // -- item family (A9-A11 + ranked top-k extension) --
    "q_top_items" -> ((s, d) => Items.topItemsPerMinute(cs(s, d))),
    "q_top_items_ranked" -> ((s, d) => Items.topItemsRanked(cs(s, d), 5)),
    "q_item_interactions" -> ((s, d) => Items.itemInteractions(cs(s, d))),
    "q_most_viewed_items" -> ((s, d) => Items.mostViewedItems(cs(s, d))),
    // -- relational extension family (joins/rollup/top-k/JSON; SURVEY §2.5) --
    "q_pricing_summary" -> (Relational.pricingSummary _),
    "q_revenue_by_segment" -> (Relational.revenueBySegment _),
    "q_orders_rollup" -> (Relational.ordersRollup _),
    "q_top_customers_per_segment" -> ((s, d) => Relational.topCustomersPerSegment(s, d, 3)),
    "q_order_priority" -> (Relational.orderPriorityWithLineitems _),
    "q_customers_without_orders" -> ((s, d) => Relational.customersWithoutOrders(s, d)),
    "q_customers_per_region" -> (Relational.customersPerRegionNation _),
    "q_order_gaps" -> (Relational.orderGaps _),
    "q_props_sum" -> (Relational.propsSumByType _),
    "q_value_stats" -> (Relational.valueStatsByType _),
  )

  // ---------------------------------------------------------------------------
  // DuckDB oracle SQL. Shared CTE prelude mirrors Tables.clickstream /
  // Sessionize exactly (incl. the deterministic itemid tiebreak and
  // floor-seconds gap arithmetic: epoch_us//1_000_000 == Spark unix_timestamp).
  // ---------------------------------------------------------------------------

  private val CS =
    """WITH cs AS (
      |  SELECT CAST(user_id AS VARCHAR) AS visitorid, ts AS event_time,
      |         event_type AS event, CAST(event_id AS VARCHAR) AS itemid
      |  FROM events
      |)""".stripMargin

  private val SESS = CS +
    """, lagd AS (
      |  SELECT *, lag(event_time) OVER (PARTITION BY visitorid ORDER BY event_time, itemid) AS prev_event_time FROM cs
      |), gapd AS (
      |  SELECT *, epoch_us(event_time)//1000000 - epoch_us(prev_event_time)//1000000 AS diff_seconds FROM lagd
      |), flagd AS (
      |  SELECT *, CASE WHEN prev_event_time IS NULL THEN 1 WHEN diff_seconds > 1800 THEN 1 ELSE 0 END AS is_new_session FROM gapd
      |), sess AS (
      |  SELECT *, CAST(sum(is_new_session) OVER (PARTITION BY visitorid ORDER BY event_time, itemid ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_number FROM flagd
      |), sid AS (
      |  SELECT *, concat(visitorid, '_', session_number) AS session_id FROM sess
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_clean_enrich" -> (CS +
      """ SELECT visitorid, event_time, event, itemid,
        |   CASE WHEN event = 'view' THEN 'Low Value' ELSE 'High Value' END AS event_category,
        |   strftime(event_time, '%Y-%m-%d %H:%M:%S') AS timestamp_str,
        |   epoch_ms(event_time) AS unix_ms
        | FROM cs""".stripMargin),
    "q_sessionize" -> (SESS +
      """ SELECT visitorid, event_time, event, itemid, prev_event_time,
        |   diff_seconds, is_new_session, session_number, session_id FROM sid""".stripMargin),
    "q_sessions" -> (SESS +
      """ SELECT session_id, visitorid,
        |   min(event_time) AS session_start, max(event_time) AS session_end,
        |   count(*) AS events_in_session,
        |   epoch_us(max(event_time))//1000000 - epoch_us(min(event_time))//1000000 AS session_length
        | FROM sid GROUP BY session_id, visitorid""".stripMargin),
    "q_user_paths" -> (SESS +
      """ SELECT visitorid, session_id,
        |   array_agg(event ORDER BY event_time, event) AS user_path
        | FROM sid GROUP BY visitorid, session_id""".stripMargin),
    "q_funnel" -> (SESS +
      """, se AS (
        |  SELECT visitorid, session_id, array_agg(event) AS events
        |  FROM sid GROUP BY visitorid, session_id
        |) SELECT
        |   CAST(sum(CASE WHEN list_contains(events, 'view') THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |   CAST(sum(CASE WHEN list_contains(events, 'click') THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |   CAST(sum(CASE WHEN list_contains(events, 'purchase') THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
        | FROM se""".stripMargin),
    "q_events_per_minute" -> (CS +
      """ SELECT date_trunc('minute', event_time) AS minute, count(*) AS events_count
        | FROM cs GROUP BY 1""".stripMargin),
    "q_active_users" -> (CS +
      """ SELECT date_trunc('minute', event_time) AS minute,
        |   count(DISTINCT visitorid) AS active_users
        | FROM cs GROUP BY 1""".stripMargin),
    "q_event_type_distribution" -> (CS +
      """ SELECT date_trunc('minute', event_time) AS minute, event,
        |   count(*) AS event_count
        | FROM cs GROUP BY 1, 2""".stripMargin),
    "q_bounce_rate" -> (CS +
      """, per_user AS (
        |  SELECT date_trunc('minute', event_time) AS minute, visitorid, count(*) AS events
        |  FROM cs GROUP BY 1, 2
        |) SELECT minute,
        |   CAST(sum(CASE WHEN events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounces,
        |   count(*) AS total_users,
        |   CAST(sum(CASE WHEN events = 1 THEN 1 ELSE 0 END) AS BIGINT) / count(*) AS bounce_rate
        | FROM per_user GROUP BY minute""".stripMargin),
    "q_top_items" -> (CS +
      """ SELECT date_trunc('minute', event_time) AS minute, itemid,
        |   count(*) AS interactions
        | FROM cs GROUP BY 1, 2""".stripMargin),
    "q_top_items_ranked" -> (CS +
      """, agg AS (
        |  SELECT date_trunc('minute', event_time) AS minute, itemid, count(*) AS interactions
        |  FROM cs GROUP BY 1, 2
        |), ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY minute ORDER BY interactions DESC, itemid ASC) AS INTEGER) AS rank
        |  FROM agg
        |) SELECT minute, itemid, interactions, rank FROM ranked WHERE rank <= 5""".stripMargin),
    "q_item_interactions" -> (CS +
      """ SELECT itemid, count(*) AS interaction_count FROM cs GROUP BY itemid""".stripMargin),
    "q_most_viewed_items" -> (CS +
      """ SELECT itemid, count(*) AS view_count FROM cs WHERE event = 'view' GROUP BY itemid""".stripMargin),
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_revenue_by_segment" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lineitems
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q_orders_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_top_customers_per_segment" ->
      """WITH pc AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS drev
        |  FROM orders GROUP BY o_custkey
        |), ranked AS (
        |  SELECT c_mktsegment, c_custkey, drev,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY drev DESC, c_custkey ASC) AS INTEGER) AS rank
        |  FROM pc JOIN customer ON o_custkey = c_custkey
        |) SELECT c_mktsegment, c_custkey, CAST(drev AS DOUBLE) AS revenue, rank
        |FROM ranked WHERE rank <= 3""".stripMargin,
    "q_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority""".stripMargin,
    "q_customers_without_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_mktsegment""".stripMargin,
    "q_customers_per_region" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q_order_gaps" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date,
        |  CAST(date_diff('day',
        |    CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
        |    CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
        |FROM orders""".stripMargin,
    "q_props_sum" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q_value_stats" ->
      """SELECT event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
        |  count(*) AS n_events, min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY event_type""".stripMargin,
  )
}

package graft.clean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.schema.Schemas

/**
 * The NiFi middle tier collapsed into one declarative Spark stage
 * (SURVEY.md §3.3): parse → validate → enrich. In the reference this is a
 * 5-processor NiFi flow (clickstream_project.xml); here it is a pure
 * DataFrame function, batch-testable and streaming-composable.
 *
 *  - parse: Kafka envelope → columns (P1, stream_processor.py:62-65)
 *  - validate: drop records with empty visitorid/itemid
 *    (P4, RouteOnContent regex, clickstream_project.xml:1113-1114)
 *  - enrich: event_category (P5, :1017-1018), wall-clock timestamp string
 *    (P6, :1021-1022), unix_timestamp carry-through (P7, :1025-1027),
 *    typed event_time (P2, stream_processor.py:68-70)
 */
object CleanStage {

  /** P1: parse a Kafka-style (key, value) frame into clean-event columns. */
  def parseKafkaEnvelope(kafka: DataFrame): DataFrame =
    kafka
      .select(
        col("key").cast("string").as("session_key"),
        from_json(col("value").cast("string"), Schemas.clean).as("v"))
      .select(col("session_key"), col("v.*"))

  /** P4: NiFi validation — reject rows with empty visitorid or itemid.
    * Valid rows pass; use [[invalid]] for the side output. */
  def validate(raw: DataFrame): DataFrame =
    raw.filter(!(col("visitorid") === "" || col("itemid") === "") &&
      col("visitorid").isNotNull && col("itemid").isNotNull)

  /** The NiFi `invalid_record` route (logged, not published). */
  def invalid(raw: DataFrame): DataFrame =
    raw.filter(col("visitorid") === "" || col("itemid") === "" ||
      col("visitorid").isNull || col("itemid").isNull)

  /**
   * P5+P6+P7 enrichment over an epoch-ms `timestamp` string column, exactly
   * the NiFi UpdateRecord semantics (clickstream_project.xml:1003-1028):
   * event_category, reformatted timestamp, preserved unix_timestamp, and the
   * Spark-derived typed event_time (P2 — timestamp_millis avoids the
   * reference's divide-then-cast double round trip, same result).
   */
  def enrich(validated: DataFrame): DataFrame =
    validated
      .withColumn("unix_timestamp", col("timestamp"))
      .withColumn("event_category",
        when(col("event") === "view", lit("Low Value")).otherwise(lit("High Value")))
      .withColumn("event_time", timestamp_millis(col("unix_timestamp").cast("long")))
      .withColumn("timestamp", date_format(col("event_time"), "yyyy-MM-dd HH:mm:ss"))

  /** Full raw→clean stage: validate then enrich. */
  def apply(raw: DataFrame): DataFrame = enrich(validate(raw))

  /**
   * Enrichment over an already-typed clickstream frame (the testdata
   * adapter's shape: event_time timestamp present). Adds the NiFi-derived
   * columns without the string round-trip.
   */
  def enrichTyped(events: DataFrame): DataFrame =
    events
      .withColumn("event_category",
        when(col("event") === "view", lit("Low Value")).otherwise(lit("High Value")))
      .withColumn("timestamp_str", date_format(col("event_time"), "yyyy-MM-dd HH:mm:ss"))
      // event_time may be TIMESTAMP_NTZ (testdata adapter); unix_millis wants
      // TIMESTAMP — the cast is identity under the UTC session zone.
      .withColumn("unix_ms", unix_millis(col("event_time").cast("timestamp")))

  /**
   * Validation with FREE-RIDER quality metrics via the Observation API:
   * row/invalid counters are collected by the same job that produces the
   * clean frame — no second scan, no separate count() action (at 100 TB a
   * dedicated metrics pass re-reads the corpus; `observe` rides the
   * existing one). Call `observation.get` AFTER an action on the returned
   * frame; keys: n_raw, n_invalid.
   *
   * The observed frame counts invalids BEFORE filtering them, so the
   * contract n_raw = n_invalid + |returned rows| holds by construction.
   */
  def validateObserved(raw: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val bad = col("visitorid") === "" || col("itemid") === "" ||
      col("visitorid").isNull || col("itemid").isNull
    val observed = raw.observe(obs,
      count(lit(1)).as("n_raw"),
      sum(when(bad, 1L).otherwise(0L)).as("n_invalid"))
    (observed.filter(!bad), obs)
  }
}

package graft.schema

import org.apache.spark.sql.types._

/**
 * Data contracts of the clickstream pipeline, reconstructed from the
 * reference (see /root/repo/SURVEY.md §1):
 *
 *  - raw CSV / Kafka `raw_clickstream` record: 5 string-valued fields
 *    (reference: producer.py:28-45 — csv.DictReader makes every value a
 *    string before JSON encoding).
 *  - clean Kafka `clean_clickstream` record: 7 nullable StringType fields,
 *    exactly the ingest StructType the reference declares
 *    (reference: stream_processor.py:41-49).
 *
 * Everything enters as strings; numeric/temporal typing is re-established
 * by casts in [[graft.clean.CleanStage]] (reference: stream_processor.py:68-70).
 */
object Schemas {

  /** Raw producer-side record (reference: producer.py:28-45). */
  val raw: StructType = StructType(
    Seq("timestamp", "visitorid", "event", "itemid", "transactionid")
      .map(StructField(_, StringType, nullable = true)))

  /** Clean-topic ingest schema — 7 nullable strings
    * (reference: stream_processor.py:41-49). */
  val clean: StructType = StructType(
    Seq("timestamp", "visitorid", "event", "itemid", "transactionid",
        "event_category", "unix_timestamp")
      .map(StructField(_, StringType, nullable = true)))

  /** Event domain of the reference dataset (data/test.ipynb unique() cell). */
  val referenceEventDomain: Seq[String] = Seq("view", "addtocart", "transaction")

  /** Funnel steps in the reference (stream_processor.py:197-216). */
  val referenceFunnelSteps: Seq[String] = referenceEventDomain

  /** Funnel steps for the driver testdata `events` table
    * (event_type domain: click, error, purchase, signup, view). */
  val testdataFunnelSteps: Seq[String] = Seq("view", "click", "purchase")
}

/** Typed view of a cleaned, time-typed clickstream event. */
final case class CleanEvent(
    visitorid: String,
    event: String,
    itemid: String,
    transactionid: String,
    event_category: String,
    event_time: java.sql.Timestamp)

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Schemas

/**
 * Ingest-side utilities (S1–S4, S10 of SURVEY.md §2.1): the producer/replay
 * path of the reference (producer.py) re-expressed as Spark sources/sinks.
 */
object Replay {

  /** S1: raw CSV scan with the reference's 5-column header schema
    * (producer.py:28-34 — every value a string, like csv.DictReader). */
  def readRawCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(Schemas.raw)
      .csv(path)

  /**
   * S2: rate-limited replay — the reference sleeps 0.1 s per record
   * (producer.py:13-14,51); the Spark-native equivalent is the `rate`
   * source driving a lookup into the replay data. Returns a streaming
   * frame of `rowsPerSecond` synthetic clean events for smoke tests.
   */
  def rateReplay(spark: SparkSession, rowsPerSecond: Int = 10): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        col("value").cast("string").as("visitorid"),
        col("timestamp").as("event_time"),
        element_at(
          array(Schemas.referenceEventDomain.map(lit): _*),
          (pmod(col("value"), lit(3)) + 1).cast("int")).as("event"),
        concat(lit("item_"), pmod(col("value"), lit(100))).as("itemid"))

  /**
   * S3 + S10: Kafka producer sink — JSON-encoded value, key = visitorid
   * (partition affinity for sessionization, producer.py:38-45). Requires
   * the kafka connector at runtime; the (key, value) projection itself is
   * batch-testable via [[kafkaEnvelope]].
   */
  def kafkaEnvelope(events: DataFrame): DataFrame =
    events.select(
      col("visitorid").cast("string").as("key"),
      to_json(struct(events.columns.toIndexedSeq.map(col): _*)).as("value"))

  def writeKafka(events: DataFrame, bootstrapServers: String, topic: String): Unit =
    kafkaEnvelope(events).write
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()

  /** S4: the debug console consumer (consumer.py) — read a topic (or any
    * frame) and print; batch Kafka read requires the connector at runtime. */
  def consoleDebug(spark: SparkSession, bootstrapServers: String, topic: String,
                   limit: Int = 20): Unit =
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("key").cast("string"), col("value").cast("string"))
      .show(limit, truncate = false)

  /** [[consoleDebug]]'s broker-less twin over a (key, value) JSONL topic
    * dump (the same files `stream.StreamJob.readEnvelopeFiles` streams):
    * returns the (key, value) frame it prints, so tests can execute the
    * exact consumer projection end-to-end without a broker. */
  def consoleDebugFiles(spark: SparkSession, dir: String, limit: Int = 20): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val kv = StructType(Seq(StructField("key", StringType), StructField("value", StringType)))
    val frame = spark.read.schema(kv).json(dir).select(col("key"), col("value"))
    frame.show(limit, truncate = false)
    frame
  }
}

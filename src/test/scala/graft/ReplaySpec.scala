package graft

import graft.clean.CleanStage
import graft.sources.Replay

/** Ingest-side utilities: CSV source, Kafka envelope round-trip. */
class ReplaySpec extends SparkSpec {

  test("readRawCsv applies the 5-string reference schema") {
    val dir = java.nio.file.Files.createTempDirectory("csv")
    val f = dir.resolve("events.csv")
    java.nio.file.Files.writeString(f,
      "timestamp,visitorid,event,itemid,transactionid\n" +
        "1433221332117,257597,view,355908,\n" +
        "1433222276276,599528,transaction,356475,4000.0\n")
    val df = Replay.readRawCsv(spark, f.toString)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = df.orderBy("visitorid").collect()
    assert(rows.length === 2)
    assert(rows.head.getAs[String]("visitorid") === "257597")
    assert(rows.head.getAs[String]("transactionid") === null) // empty -> null
  }

  test("kafka envelope round-trips through parseKafkaEnvelope") {
    import spark.implicits._
    val clean = Seq(
      ("2015-06-02 05:02:12", "257597", "view", "355908", "", "Low Value", "1433221332117"))
      .toDF("timestamp", "visitorid", "event", "itemid", "transactionid",
        "event_category", "unix_timestamp")
    val envelope = Replay.kafkaEnvelope(
      clean.withColumnRenamed("visitorid", "visitorid")) // key from visitorid
    val back = CleanStage.parseKafkaEnvelope(
      envelope.selectExpr("CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value"))
      .collect().head
    assert(back.getAs[String]("session_key") === "257597") // key preserved
    assert(back.getAs[String]("event_category") === "Low Value")
    assert(back.getAs[String]("unix_timestamp") === "1433221332117")
  }

  test("rate replay plan produces the clean-event shape") {
    val df = Replay.rateReplay(spark, 10)
    assert(df.isStreaming)
    assert(df.columns.toSeq === Seq("visitorid", "event_time", "event", "itemid"))
  }

  test("file-backed debug consumer executes the consumer projection end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("debug_dump").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/d.json"),
      Seq("""{"key":"u1","value":"{\"event\":\"view\"}"}""",
        """{"key":"u2","value":"{\"event\":\"click\"}"}""")
        .mkString("\n").getBytes("UTF-8"))
    val got = Replay.consoleDebugFiles(spark, dir, limit = 5).collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(got.length === 2 && got.head === (("u1", """{"event":"view"}""")))
  }
}

package graft

import graft.clean.CleanStage
import graft.schema.Schemas

class CleanStageSpec extends SparkSpec {
  import spark.implicits._

  test("validate drops empty visitorid/itemid like the NiFi RouteOnContent") {
    val raw = Seq(
      ("1433221332117", "257597", "view", "355908", ""),
      ("1433221332117", "", "view", "355908", ""),        // invalid: visitorid
      ("1433221332117", "42", "addtocart", "", ""))        // invalid: itemid
      .toDF("timestamp", "visitorid", "event", "itemid", "transactionid")
    assert(CleanStage.validate(raw).count() === 1)
    assert(CleanStage.invalid(raw).count() === 2)
  }

  test("enrich derives category, wall-clock string, typed event_time") {
    val raw = Seq(
      ("1433221332117", "257597", "view", "355908", ""),
      ("1433222276276", "599528", "transaction", "356475", "4000.0"))
      .toDF("timestamp", "visitorid", "event", "itemid", "transactionid")
    val out = CleanStage(raw).orderBy("visitorid").collect()
    val view = out.head
    assert(view.getAs[String]("event_category") === "Low Value")
    assert(view.getAs[String]("timestamp") === "2015-06-02 05:02:12")
    assert(view.getAs[String]("unix_timestamp") === "1433221332117")
    val tx = out(1)
    assert(tx.getAs[String]("event_category") === "High Value")
  }

  test("parseKafkaEnvelope expands the JSON value against the 7-string schema") {
    val kafka = Seq(
      (null.asInstanceOf[Array[Byte]],
        """{"timestamp":"2015-06-02 05:02:12","visitorid":"257597","event":"view",
          |"itemid":"355908","transactionid":"","event_category":"Low Value",
          |"unix_timestamp":"1433221332117"}""".stripMargin.replace("\n", "").getBytes))
      .toDF("key", "value")
    val out = CleanStage.parseKafkaEnvelope(kafka).collect().head
    assert(out.getAs[String]("visitorid") === "257597")
    assert(out.getAs[String]("event_category") === "Low Value")
    assert(out.isNullAt(out.fieldIndex("session_key")))  // keyless clean topic
    assert(Schemas.clean.fieldNames.forall(f => out.schema.fieldNames.contains(f)))
  }

  test("corrupt envelope values parse to all-null rows and die in validate, not the job") {
    // a poison-pill message (truncated JSON, non-JSON bytes) must never
    // kill the stream: from_json yields null fields, and the P4 validity
    // filter drops the row — the standard dead-letter demarcation point
    val kafka = Seq(
      (Array[Byte](1), """{"visitorid":"257597","itemid":"355908"""".getBytes), // truncated
      (Array[Byte](2), "not json at all".getBytes),
      (Array[Byte](3),
        """{"timestamp":"t","visitorid":"u1","event":"view","itemid":"i1",
          |"transactionid":"","event_category":"c","unix_timestamp":"1"}"""
          .stripMargin.replace("\n", "").getBytes))
      .toDF("key", "value")
    val parsed = CleanStage.parseKafkaEnvelope(kafka)
    assert(parsed.count() === 3) // parse never drops — visibility for dead-lettering
    val valid = CleanStage.validate(parsed).collect()
    assert(valid.length === 1 && valid.head.getAs[String]("visitorid") === "u1")
    val dead = CleanStage.invalid(parsed)
    assert(dead.count() === 2)
  }

  test("validateObserved: quality counters ride the producing job (no second scan)") {
    import spark.implicits._
    val raw = Seq(
      ("u1", "i1"), ("", "i2"), ("u3", ""), ("u4", "i4"), (null, "i5")
    ).toDF("visitorid", "itemid")
    val (clean, obs) = CleanStage.validateObserved(raw)
    val kept = clean.count() // the ONE action both produces rows and fills metrics
    val m = obs.get
    assert(kept === 2L)
    assert(m("n_raw") === 5L)
    assert(m("n_invalid") === 3L)
    assert(m("n_raw").asInstanceOf[Long] - m("n_invalid").asInstanceOf[Long] === kept)
  }
}

package graft

import graft.analytics.Sessionize

/** Edge cases dictated by the reference semantics (FIXTURES.md §5):
  * strict `>` on the 30-minute gap, null-prev boundary, metrics. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (String, Long, String, String)*) =
    rows.toDF("visitorid", "epoch", "event", "itemid")
      .selectExpr("visitorid", "CAST(epoch AS TIMESTAMP) AS event_time", "event", "itemid")

  test("gap of exactly 1800s stays in the same session; 1801s starts a new one") {
    val df = events(
      ("u1", 1000L, "view", "i1"),
      ("u1", 2800L, "view", "i2"),   // +1800 -> same session (strict >)
      ("u1", 4601L, "view", "i3"))   // +1801 -> new session
    val out = Sessionize(df).orderBy("event_time")
      .select("is_new_session", "session_number", "session_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(out === Array((1, 1L, "u1_1"), (0, 1L, "u1_1"), (1, 2L, "u1_2")))
  }

  test("first event per visitor is a session boundary (null prev)") {
    val df = events(("a", 10L, "view", "i1"), ("b", 10L, "view", "i2"))
    val out = Sessionize(df).select("visitorid", "is_new_session", "diff_seconds").collect()
    assert(out.forall(_.getInt(1) == 1))
    assert(out.forall(_.isNullAt(2)))
  }

  test("session metrics: start/end/count/length") {
    val df = events(
      ("u1", 1000L, "view", "i1"),
      ("u1", 1600L, "click", "i2"),
      ("u1", 9999L, "view", "i3"))  // new session
    val m = Sessionize.sessionMetrics(Sessionize(df))
      .orderBy("session_id").collect()
    assert(m.length === 2)
    val s1 = m.head
    assert(s1.getAs[String]("session_id") === "u1_1")
    assert(s1.getAs[Long]("events_in_session") === 2L)
    assert(s1.getAs[Long]("session_length") === 600L)
    assert(m(1).getAs[Long]("session_length") === 0L)  // single-event session
  }
}

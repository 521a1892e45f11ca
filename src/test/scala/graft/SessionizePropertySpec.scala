package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.analytics.Sessionize

/** Property-based invariants of gap sessionization over generated streams
  * (raw ScalaCheck Gen sampling — the scalatest bridge isn't on the
  * offline classpath). */
class SessionizePropertySpec extends SparkSpec {
  import spark.implicits._

  private val genEvents: Gen[List[(String, Long)]] = for {
    nUsers <- Gen.choose(1, 5)
    n <- Gen.choose(1, 60)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(1, nUsers)
      t <- Gen.choose(0L, 20000L)
    } yield (s"u$u", t))
  } yield evs

  test("invariants: partition into sessions, boundaries count, in-session gaps") {
    (0 until 30).foreach { i =>
      val evs = genEvents(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(List(("u1", 0L)))
      val df = evs.zipWithIndex
        .map { case ((u, t), idx) => (u, t, "view", s"i$idx") }
        .toDF("visitorid", "epoch", "event", "itemid")
        .selectExpr("visitorid", "CAST(epoch AS TIMESTAMP) AS event_time", "event", "itemid")
      val sess = Sessionize(df, gapSeconds = 1800L).cache()
      val rows = sess.collect()

      // 1. every event is assigned exactly one session
      assert(rows.length === evs.length, s"iteration $i")
      assert(rows.forall(r => !r.isNullAt(r.fieldIndex("session_id"))))

      // 2. per visitor: max session_number == number of boundary flags
      rows.groupBy(_.getAs[String]("visitorid")).foreach { case (_, rs) =>
        val boundaries = rs.map(_.getAs[Int]("is_new_session")).sum
        assert(rs.map(_.getAs[Long]("session_number")).max === boundaries.toLong)
      }

      // 3. non-boundary events sit within the gap of their predecessor
      rows.filter(_.getAs[Int]("is_new_session") == 0).foreach { r =>
        assert(r.getAs[Long]("diff_seconds") <= 1800L)
      }

      // 4. session metrics partition the events
      val metrics = Sessionize.sessionMetrics(sess).collect()
      assert(metrics.map(_.getAs[Long]("events_in_session")).sum === evs.length.toLong)
      sess.unpersist()
      ()
    }
  }
}

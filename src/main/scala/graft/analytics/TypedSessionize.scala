package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Input row for the typed path (event_time as NTZ micros—encoded LocalDateTime). */
final case class TypedEvent(visitorid: String, event_time: java.time.LocalDateTime, itemid: String)

/** One session, reference metric schema (A1). */
final case class TypedSession(
    session_id: String, visitorid: String,
    session_start: java.time.LocalDateTime, session_end: java.time.LocalDateTime,
    events_in_session: Long, session_length: Long)

/**
 * Typed-Dataset sessionization: `groupByKey(visitorid)` + `flatMapGroups`,
 * sorting one visitor's events in memory and emitting sessions in a single
 * pass — the third independent implementation of the flagship operator
 * (window functions, session_window, and this), all checked against the
 * same DuckDB oracle.
 *
 * Scale shape: one shuffle on visitorid (same as the window
 * implementation); per-group state is one visitor's events — bounded by
 * per-visitor volume, not dataset size. Versus WindowExec it trades
 * Tungsten spill-ability for arbitrary Scala logic; use it when the
 * session reduction can't be phrased as window expressions (the reference's
 * CAN — this is the API-coverage/benchmark twin, and the shape
 * `flatMapGroupsWithState` builds on in streaming).
 */
object TypedSessionize {

  private def floorSeconds(t: java.time.LocalDateTime): Long =
    t.toEpochSecond(java.time.ZoneOffset.UTC)

  def sessionMetrics(spark: SparkSession, events: Dataset[TypedEvent],
                     gapSeconds: Long = Sessionize.DefaultGapSeconds): Dataset[TypedSession] = {
    import spark.implicits._
    events.groupByKey(_.visitorid).flatMapGroups { (visitorid, it) =>
      // same ordering as the window implementation: (event_time, itemid)
      // null itemid sorts first (Spark's nulls-first), matching Sessionize
      val evs = it.toArray.sortBy(e =>
        (e.event_time, Option(e.itemid).getOrElse("")))(
        Ordering.Tuple2(Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _), Ordering.String))
      val out = Seq.newBuilder[TypedSession]
      var sessionNum = 0L
      var start: java.time.LocalDateTime = null
      var end: java.time.LocalDateTime = null
      var count = 0L
      def emit(): Unit = if (count > 0) {
        // concat_ws semantics: a null visitorid contributes nothing
        val sid = if (visitorid == null) s"$sessionNum" else s"${visitorid}_$sessionNum"
        out += TypedSession(sid, visitorid, start, end,
          count, floorSeconds(end) - floorSeconds(start))
      }
      evs.foreach { e =>
        // reference gap rule: floor-seconds diff, strict > gap
        val isNew = count == 0 ||
          floorSeconds(e.event_time) - floorSeconds(end) > gapSeconds
        if (isNew) {
          emit()
          sessionNum += 1
          start = e.event_time
          count = 0
        }
        end = e.event_time
        count += 1
      }
      emit()
      out.result().iterator
    }
  }

  /** DataFrame adapter over the clickstream shape. */
  def apply(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    sessionMetrics(spark,
      events.select("visitorid", "event_time", "itemid").as[TypedEvent]).toDF()
  }
}

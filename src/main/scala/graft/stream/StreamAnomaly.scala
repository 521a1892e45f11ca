package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-minute count of one event type, finalized when the watermark passes
  * the minute; `z` is the causal anomaly score against the moments of all
  * PRIOR finalized minutes (None until 2 prior minutes exist and variance
  * is nonzero). */
final case class AnomalyPoint(
    event: String, minute: Timestamp, cnt: Long, n_prior: Long, z: Option[Double])

/** Keyed running state: exact integer moments of finalized minutes +
  * still-open per-minute partial counts (epoch-minute → count). */
final case class AnomalyState(
    n: Long, s: Long, s2: Long, pending: Map[Long, Long])

/**
 * Streaming anomaly detection — the causal twin of
 * [[graft.analytics.MinuteStats.minuteAnomaly]] (which scores each minute
 * against the GLOBAL moments; here each minute is scored against the
 * moments of the minutes finalized BEFORE it, which is what a live monitor
 * can actually know).
 *
 * State per event type is three integers plus the open minutes inside the
 * watermark — bounded by the watermark horizon, independent of stream
 * length. Minutes are finalized in ascending order when the watermark
 * passes their end, so emission order (and therefore every z) is
 * deterministic for a given watermark trajectory; the z arithmetic is the
 * same single-op IEEE chain as the batch operator.
 */
object StreamAnomaly {

  /** Minute floor of an event-time ms value. */
  private def minuteFloorMs(ms: Long): Long = ms - Math.floorMod(ms, 60000L)

  def minuteAnomalyStreaming(
      spark: SparkSession, events: DataFrame,
      watermark: String = "10 minutes"): Dataset[AnomalyPoint] = {
    import spark.implicits._

    def score(st: AnomalyState, cnt: Long): Option[Double] = {
      if (st.n < 2) return None
      val mean = st.s.toDouble / st.n.toDouble
      val meansq = st.s2.toDouble / st.n.toDouble
      val variance = math.max(meansq - mean * mean, 0.0)
      if (variance == 0.0) None
      else Some((cnt.toDouble - mean) / math.sqrt(variance))
    }

    def fn(event: String, it: Iterator[(String, Timestamp)],
           state: GroupState[AnomalyState]): Iterator[AnomalyPoint] = {
      val st0 = state.getOption.getOrElse(AnomalyState(0L, 0L, 0L, Map.empty))
      val wm = state.getCurrentWatermarkMs()
      // fold new events into their open minutes. Late rows are NOT
      // auto-dropped for flatMapGroupsWithState (only for built-in
      // stateful operators): an event whose minute the watermark already
      // closed would re-open and RE-EMIT that minute — a duplicate, out
      // of causal order, with corrupted moments. Drop it, the same fate a
      // windowed aggregation gives it.
      val pending = it.foldLeft(st0.pending) { case (p, (_, ts)) =>
        val m = minuteFloorMs(ts.getTime)
        if (m + 60000L <= wm) p
        else p.updated(m, p.getOrElse(m, 0L) + 1L)
      }
      // finalize minutes the watermark has passed, oldest first — each is
      // scored against the moments of everything finalized before it
      val (done, open) = pending.partition { case (m, _) => m + 60000L <= wm }
      var st = st0
      val out = done.toSeq.sortBy(_._1).map { case (m, cnt) =>
        val p = AnomalyPoint(event, new Timestamp(m), cnt, st.n, score(st, cnt))
        st = AnomalyState(st.n + 1, st.s + cnt, st.s2 + cnt * cnt, Map.empty)
        p
      }
      val newState = AnomalyState(st.n, st.s, st.s2, open)
      state.update(newState)
      // wake up when the watermark passes the oldest still-open minute so
      // it gets finalized even if this key never sees data again
      if (open.nonEmpty)
        state.setTimeoutTimestamp(open.keys.min + 60000L)
      out.iterator
    }

    events
      .selectExpr("event", "event_time")
      .withWatermark("event_time", watermark)
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}

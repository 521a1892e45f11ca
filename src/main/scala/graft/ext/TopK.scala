package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Space-saving heavy hitters (Metwally et al. '05) as a typed
 * [[Aggregator]] — the custom-aggregate path for streaming/batch top-k
 * without materializing the full key distribution.
 *
 * State is a bounded counter map of `capacity` entries: a new key evicts
 * the minimum counter and inherits its count + 1 (the classic
 * overestimate-bounded scheme). With skewed data and capacity ≥ the number
 * of distinct hot keys the result is exact; in general each reported count
 * overestimates by at most the evicted minimum. `merge` sums counters and
 * re-truncates — associative within the same error bound.
 *
 * At 100 TB this is the shape that replaces `groupBy(key).count + sort` for
 * "top items" on unbounded key domains: fixed-size partial state per task,
 * one final merge, no full shuffle of the key distribution.
 *
 * Complexity note: eviction does an O(capacity) min scan, so mostly-unique
 * streams pay O(n·capacity); the classic Stream-Summary (min-tracked bucket
 * list) brings that to O(1) amortized and is the planned upgrade if this
 * aggregator lands on such workloads (ROADMAP).
 */
class SpaceSavingTopK(k: Int, capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[(String, Long)]] {

  def this(k: Int) = this(k, k * 8)

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < capacity => buf.update(item, 1L)
      case None =>
        val (minKey, minCount) = buf.minBy { case (key, c) => (c, key) }
        buf.remove(minKey)
        buf.update(item, minCount + 1)
    }
    buf
  }

  override def merge(b1: mutable.Map[String, Long], b2: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b2.foreach { case (key, c) => b1.update(key, b1.getOrElse(key, 0L) + c) }
    if (b1.size > capacity) {
      val keep = b1.toSeq.sortBy { case (key, c) => (-c, key) }.take(capacity)
      b1.clear()
      keep.foreach { case (key, c) => b1.update(key, c) }
    }
    b1
  }

  override def finish(buf: mutable.Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object TopK {
  /** Top-k heavy hitters of a string Dataset via the bounded aggregator. */
  def heavyHitters(items: Dataset[String], k: Int, capacity: Int = 0): Seq[(String, Long)] = {
    val agg = if (capacity > 0) new SpaceSavingTopK(k, capacity) else new SpaceSavingTopK(k)
    items.select(agg.toColumn).head()
  }
}

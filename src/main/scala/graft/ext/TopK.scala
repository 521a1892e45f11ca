package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded counter state for [[SpaceSavingTopK]]: a key→count map mirrored
 * by an ordered (count, key) set that tracks the minimum — the
 * Stream-Summary idea (Metwally et al. '05) with the count-bucket list
 * collapsed into one ordered mirror. Increment, insert, and evict-min are
 * all O(log capacity) instead of the O(capacity) min scan the naive map
 * pays per eviction — the difference between O(n log c) and O(n·c) on
 * mostly-unique streams, where every arrival evicts. (A literal linked
 * Stream-Summary reaches amortized O(1) but must evict an ARBITRARY member
 * of the min bucket; this engine pins deterministic (min count, min key)
 * eviction — reproducible results beat the last log factor.)
 *
 * The mirror is @transient and built LAZILY — not on the first offer, but
 * on the first EVICTION (and rebuilt on the same trigger after
 * deserialization or a merge): in the exact regime (capacity ≥ distinct
 * keys — every oracle-gated use) no eviction ever fires, so each arrival
 * is one HashMap update and the mirror never exists. The round-9 probe
 * measured the always-maintained mirror at 188–390 ns/token of aggregate
 * overhead (the top line of the 100× sweep's worst ratio, 37.1×); hit
 * counting needs no order information, so that work was pure waste in the
 * no-eviction regime. Once built, the mirror is maintained incrementally
 * exactly as before — the evict-heavy regime is unchanged.
 */
final class TopKState extends Serializable {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  /** True once any arrival evicted a counter or a merge truncated: counts
    * may overestimate from then on. Serialized with the state (not
    * transient), so the flag survives partial-aggregate shipping — the
    * exactness witness for oracle-gated uses ([[SpaceSavingTopK]] strict
    * mode). */
  var approximated: Boolean = false

  @transient private var orderOrNull: mutable.TreeSet[(Long, String)] = _

  private def order: mutable.TreeSet[(Long, String)] = {
    if (orderOrNull == null) {
      orderOrNull = mutable.TreeSet.empty[(Long, String)]
      counts.foreach { case (k, c) => orderOrNull.add((c, k)) }
    }
    orderOrNull
  }

  /** Space-saving arrival: count a hit, or admit under capacity, or evict
    * the (min count, min key) entry and inherit its count + 1. The mirror
    * is only touched when it already exists (a past eviction built it) —
    * the eviction branch itself forces the lazy build via [[order]]. */
  def offer(item: String, capacity: Int): Unit = counts.get(item) match {
    case Some(c) =>
      counts.update(item, c + 1)
      val ord = orderOrNull
      if (ord != null) { ord.remove((c, item)); ord.add((c + 1, item)) }
    case None if counts.size < capacity =>
      counts.update(item, 1L)
      val ord = orderOrNull
      if (ord != null) ord.add((1L, item))
    case None =>
      approximated = true
      val min @ (minCount, minKey) = order.head
      order.remove(min)
      counts.remove(minKey)
      counts.update(item, minCount + 1)
      order.add((minCount + 1, item))
  }

  /** Merge another state's counters in (sum) and re-truncate to the
    * `capacity` largest by (count desc, key asc) — infrequent (one per
    * partial-aggregate pair), so the O(c log c) rebuild is fine. */
  def absorb(other: TopKState, capacity: Int): Unit = {
    approximated ||= other.approximated
    other.counts.foreach { case (key, c) =>
      counts.update(key, counts.getOrElse(key, 0L) + c)
    }
    if (counts.size > capacity) {
      approximated = true
      val keep = counts.toSeq.sortBy { case (key, c) => (-c, key) }.take(capacity)
      counts.clear()
      keep.foreach { case (key, c) => counts.update(key, c) }
    }
    orderOrNull = null // counts changed wholesale; rebuild on next offer
  }

  def top(k: Int): Seq[(String, Long)] =
    counts.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)
}

/**
 * Space-saving heavy hitters (Metwally et al. '05) as a typed
 * [[Aggregator]] — the custom-aggregate path for streaming/batch top-k
 * without materializing the full key distribution.
 *
 * State is a bounded counter structure of `capacity` entries ([[TopKState]]):
 * a new key evicts the minimum counter and inherits its count + 1 (the
 * classic overestimate-bounded scheme). With skewed data and capacity ≥ the
 * number of distinct hot keys the result is exact; in general each reported
 * count overestimates by at most the evicted minimum. `merge` sums counters
 * and re-truncates — associative within the same error bound.
 *
 * At 100 TB this is the shape that replaces `groupBy(key).count + sort` for
 * "top items" on unbounded key domains: fixed-size partial state per task,
 * one final merge, no full shuffle of the key distribution.
 */
class SpaceSavingTopK(k: Int, capacity: Int, strict: Boolean = false)
    extends Aggregator[String, TopKState, Seq[(String, Long)]] {

  def this(k: Int) = this(k, k * 8)

  override def zero: TopKState = new TopKState

  override def reduce(buf: TopKState, item: String): TopKState = {
    buf.offer(item, capacity)
    buf
  }

  override def merge(b1: TopKState, b2: TopKState): TopKState = {
    b1.absorb(b2, capacity)
    b1
  }

  /** In `strict` mode, fail loud the moment the exact regime breaks: an
    * oracle that assumes capacity ≥ distinct keys (q_spacesaving_topk)
    * would otherwise surface a data-dependent capacity overflow as a bare
    * hash mismatch with no pointer to the cause. */
  override def finish(buf: TopKState): Seq[(String, Long)] = {
    if (strict && buf.approximated) throw new IllegalStateException(
      s"space-saving capacity $capacity overflowed (distinct keys exceed it): " +
        "counts are now approximate and the exact-regime oracle gate no longer " +
        "holds — raise capacity or drop strict mode")
    buf.top(k)
  }

  override def bufferEncoder: Encoder[TopKState] = Encoders.kryo[TopKState]
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

/**
 * Shared bounded-buffer core for exact "best k of a group" Aggregators —
 * the scale-correct alternative to a window-rank formulation: a window
 * rank SORTS every group's full row set after the shuffle; this buffer
 * holds only k entries per group at every partial/merge stage, so the
 * shuffle carries ≤ k rows per group from each map task and there is no
 * sort at all. Subclasses supply the total order via [[beats]]; a total
 * order makes the kept set and its ordering deterministic.
 */
abstract class BoundedBestK(k: Int)
    extends Aggregator[(String, Long), List[(String, Long)], Seq[(String, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  /** True when `a` outranks `b` — MUST be a strict total order. */
  protected def beats(a: (String, Long), b: (String, Long)): Boolean

  /** When true, an element equal to one already buffered is NOT inserted
    * again — set-semantics bottom-k/top-k. Required when the same element
    * can arrive many times (stream keys); inconsequential when inputs are
    * already at the element grain. */
  protected def distinctElements: Boolean = false

  override def zero: List[(String, Long)] = Nil

  // buffer kept best-first and trimmed to k — insertion keeps it sorted;
  // under a strict total order an equal element sits exactly at the
  // insertion point, so the duplicate check is O(1) there
  override def reduce(buf: List[(String, Long)], x: (String, Long)): List[(String, Long)] = {
    val (better, worse) = buf.span(beats(_, x))
    if (distinctElements && worse.headOption.contains(x)) buf
    else (better ::: x :: worse).take(k)
  }

  override def merge(a: List[(String, Long)], b: List[(String, Long)]): List[(String, Long)] = {
    // merge two sorted lists, keep the best k
    val out = List.newBuilder[(String, Long)]
    var (xa, xb) = (a, b)
    var n = 0
    while (n < k && (xa.nonEmpty || xb.nonEmpty)) {
      if (distinctElements && xa.nonEmpty && xb.nonEmpty && xa.head == xb.head) {
        out += xa.head; xa = xa.tail; xb = xb.tail
      } else if (xb.isEmpty || (xa.nonEmpty && beats(xa.head, xb.head))) {
        out += xa.head; xa = xa.tail
      } else { out += xb.head; xb = xb.tail }
      n += 1
    }
    out.result()
  }

  override def finish(buf: List[(String, Long)]): Seq[(String, Long)] = buf

  override def bufferEncoder: Encoder[List[(String, Long)]] =
    Encoders.kryo[List[(String, Long)]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    Encoders.kryo[Seq[(String, Long)]]
}

/**
 * EXACT per-group top-k counts on the bounded buffer ([[BoundedBestK]]) —
 * order: count desc, then item asc. Result-identical to the window-rank
 * form ([[graft.analytics.Items.topItemsRanked]]), which is what its
 * oracle pins.
 *
 * Input rows are (item, count) pairs that are ALREADY aggregated to the
 * (group, item) grain — compose as: count per (group, item) → groupByKey
 * (group) → this aggregator.
 */
class GroupedTopK(k: Int) extends BoundedBestK(k) {
  /** Higher count first, item asc tiebreak. */
  override protected def beats(a: (String, Long), b: (String, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
}

/**
 * Deterministic bounded-state uniform sampling: keep the k SMALLEST
 * (sort_key, id) pairs per group. With sort_key = a content hash of the
 * id, the kept set is a uniform k-sample of the group that is (a)
 * reproducible across runs AND engines (no RNG state — the hash is the
 * randomness), (b) mergeable — bottom-k of a union is the bottom-k of the
 * parts' bottom-k's, the bottom-k sketch of Cohen & Kaplan '07 — and (c)
 * bounded: each map task ships ≤ k entries per group, where the
 * equivalent `row_number() OVER (ORDER BY hash)` formulation sorts every
 * group's full row set after the shuffle. At 100 TB this is how you draw
 * a reviewable corpus sample without a global sort.
 */
class BottomKSample(k: Int) extends BoundedBestK(k) {
  /** Smaller sort key first; id asc tiebreak (md5 collisions included). */
  override protected def beats(a: (String, Long), b: (String, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Set semantics: a key arriving many times (stream dedup keys, repeated
    * ids) fills ONE slot, not k — the sample stays a k-subset of the
    * DISTINCT elements, which is what "uniform sample" promises. */
  override protected def distinctElements: Boolean = true
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Banded (interval) range join: all (left, right) pairs with equal keys and
 * `rightTime` in `[leftTime - window, leftTime]` — the "what happened in
 * the last N days before this event" enrichment, the second temporal join
 * Spark has no built-in operator for (the first, as-of, is
 * [[AsOfJoin]]/[[graft.plans.AsOfJoinExec]]).
 *
 * The naive formulation — `l.join(r, keyEq && between)` — carries the
 * BETWEEN as a non-equi predicate, so Spark plans a per-key cross product
 * (or a broadcast nested loop): |L|·|R| work per key, a blowup at any real
 * scale. This is the standard binned decomposition instead: bucket the time
 * axis at `window` granularity, replicate each LEFT row to the (at most
 * two) buckets its window can reach, land each RIGHT row in exactly one
 * bucket, and join as a plain EQUI-join on (key, bucket) with the precise
 * BETWEEN as a residual filter. Shuffle and probe work are proportional to
 * genuine bucket co-occurrences; each qualifying pair appears exactly once
 * because the right row owns a single bucket.
 *
 * Returns inner-join pairs (left columns + right columns). For left-outer
 * semantics aggregate the pairs and join back onto the left table — the
 * two-bucket replication would otherwise emit duplicate null-padded rows
 * for unmatched left rows (see `Relational.eventsWithRecentOrders`).
 *
 * Time columns must be timestamp-typed (TIMESTAMP or TIMESTAMP_NTZ) and
 * MUST share one type: with mixed types (e.g. NTZ left vs instant right)
 * the two bin axes are anchored in different clocks, so in a DST session
 * timezone they can disagree by the DST offset and a qualifying pair near
 * a bin edge would silently drop — and the residual BETWEEN would compare
 * across clocks too. Callers with mixed types cast one side explicitly,
 * choosing the semantics. Null times on either side never match (the
 * residual BETWEEN is NULL).
 */
object RangeJoin {

  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String,
            leftTime: String, rightTime: String,
            windowSeconds: Long): DataFrame =
    join(left, right, leftKey, rightKey, leftTime, rightTime, windowSeconds,
      joinType = "inner")

  /**
   * Left-outer form fused for aggregation: every left row appears as its
   * (exactly two) bin replicas, null-padded where a replica matched
   * nothing. Callers MUST aggregate by a left-row key — with null-ignoring
   * aggregates (count(rightCol), max, ...) the two replicas collapse to
   * the correct left-outer aggregate in ONE pass, with no second scan of
   * the left table to restore unmatched rows (the plain left-outer
   * formulation would emit duplicate null-padded rows instead).
   */
  def leftJoinReplicated(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTime: String, rightTime: String,
                         windowSeconds: Long): DataFrame =
    join(left, right, leftKey, rightKey, leftTime, rightTime, windowSeconds,
      joinType = "left")

  private def join(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   windowSeconds: Long, joinType: String): DataFrame = {
    require(windowSeconds > 0, s"window must be positive, got $windowSeconds")
    val (lt, rt) = (left.schema(leftTime).dataType, right.schema(rightTime).dataType)
    require(lt == rt &&
        (lt == org.apache.spark.sql.types.TimestampType ||
          lt == org.apache.spark.sql.types.TimestampNTZType),
      s"RangeJoin time columns must share one timestamp type (TIMESTAMP or " +
        s"TIMESTAMP_NTZ) so the bin axes align; got $leftTime: ${lt.sql} vs " +
        s"$rightTime: ${rt.sql} — cast one side first to pick instant or " +
        s"wall-clock semantics")
    // Bin seconds come from timestampdiff against a fixed same-type anchor,
    // NOT unix_timestamp: unix_timestamp interprets TIMESTAMP_NTZ in the
    // session timezone, and a DST transition inside the window would make
    // the bin axis non-uniform — a qualifying pair could land 2 bins apart
    // and silently vanish. timestampdiff(SECOND, ...) is a pure linear
    // difference for NTZ, and for instant-typed columns the anchor offset
    // is a constant, so bins stay uniform either way.
    def binSecs(df: DataFrame, timeCol: String) = {
      val anchor = s"CAST('1970-01-01 00:00:00' AS ${df.schema(timeCol).dataType.sql})"
      // backquote: column names with spaces/dashes must survive the parser
      expr(s"timestampdiff(SECOND, $anchor, `$timeCol`)")
    }
    // bins from floor-seconds: rightTime >= leftTime - window implies the
    // right bin is in {leftBin - 1, leftBin} (window = bin width), so two
    // replicas per left row always suffice
    val l = left.withColumn("_bin",
      explode(array_distinct(array(
        floor((binSecs(left, leftTime) - windowSeconds) / windowSeconds),
        floor(binSecs(left, leftTime) / windowSeconds)))))
    val r = right.withColumn("_bin",
      floor(binSecs(right, rightTime) / windowSeconds))
    l.join(r,
        l(leftKey) === r(rightKey) && l("_bin") === r("_bin") &&
          r(rightTime) <= l(leftTime) &&
          r(rightTime) >= l(leftTime) - expr(s"INTERVAL $windowSeconds SECONDS"),
        joinType)
      .drop("_bin")
  }
}

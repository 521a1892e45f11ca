package graft

import org.apache.spark.sql.functions._

import graft.ext.Layout
import graft.functions.ZOrder2

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Bit-by-bit reference interleave — the spec the mask chain must meet. */
  private def naiveInterleave(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("ZOrder2 mask chain equals bit-by-bit interleave; masks to 31 bits; non-negative") {
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0x7FFFFFFFL, 0x7FFFFFFFL),
      (Long.MaxValue, Long.MinValue), (-1L, -1L)) ++
      Seq.fill(50)((rnd.nextLong(), rnd.nextLong()))
    cases.foreach { case (x, y) =>
      val got = ZOrder2.interleave(x, y)
      assert(got === naiveInterleave(x & 0x7FFFFFFFL, y & 0x7FFFFFFFL), s"($x,$y)")
      assert(got >= 0L)
    }
  }

  test("zValue column (codegen) matches the Scala implementation; z-order is locality-preserving") {
    val df = (0L until 500L).map(i => (i, i * 37 % 1000, i * 91 % 1000)).toDF("id", "x", "y")
    val got = df.select(col("id"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    df.collect().foreach { r =>
      assert(got(r.getLong(0)) === ZOrder2.interleave(r.getLong(1), r.getLong(2)))
    }
    // locality: the quadrant (high bits of both dims) is the z prefix —
    // points in different quadrants never interleave in z order
    val q00max = ZOrder2.interleave(511, 511)       // both dims < 512
    val q11min = ZOrder2.interleave(512, 512)       // both dims >= 512
    assert(q00max < q11min)
  }

  test("partitioned write prunes non-matching directories at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = (0 until 1000).map(i => (i.toLong, s"lang${i % 4}", i * 1.5))
      .toDF("id", "lang", "score")
    Layout.writePartitioned(df, dir, "lang")
    val read = spark.read.parquet(dir).filter(col("lang") === "lang2")
    // collect() executes THIS Dataset's QueryExecution, so the scan node
    // inspected below carries populated metrics (count() would build and
    // run a separate plan, leaving these metrics at zero)
    assert(read.collect().length === 250)
    // the scan must carry the partition filter (directory pruning) and
    // actually read only the matching partition's files — the numFiles
    // metric counts post-pruning (Dataset.inputFiles would not: it lists
    // the whole relation)
    val scan = read.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
    assert(scan.toString.contains("PartitionFilters") &&
      scan.toString.contains("lang2"), scan.toString)
    val totalFiles = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    val readFiles = scan.metrics("numFiles").value
    assert(readFiles > 0 && readFiles < totalFiles,
      s"pruning read $readFiles of $totalFiles files")
    val lang2Files = new java.io.File(s"$dir/lang=lang2").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(readFiles === lang2Files)
  }

  test("clusterByZ range-partitions disjointly and sorts within partitions") {
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(2000)((rnd.nextInt(1 << 15).toLong, rnd.nextInt(1 << 15).toLong))
      .toDF("x", "y")
    val clustered = Layout.clusterByZ(df, col("x"), col("y"), numPartitions = 8)
    // recompute z on the clustered output (helper column is dropped)
    val withPid = clustered
      .withColumn("z", Layout.zValue(col("x"), col("y")))
      .withColumn("pid", spark_partition_id())
    val ranges = withPid.groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "partition z-ranges overlap")
      case _ =>
    }
    // rows inside each partition arrive z-sorted
    val perPart = withPid.select("pid", "z").rdd
      .mapPartitions(it => Iterator(it.map(_.getLong(1)).toSeq)).collect()
    perPart.foreach(zs => assert(zs == zs.sorted, "partition not z-sorted"))
  }
}

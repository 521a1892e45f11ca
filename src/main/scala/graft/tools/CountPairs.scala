package graft.tools
import org.apache.spark.sql.SparkSession
object CountPairs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val n = graft.ext.Dedup.simhashPairs(graft.Tables.documents(spark, dir),
        bitsPerBand = graft.ext.Dedup.ProductionSimhashBitsPerBand,
        maxBucketSize = graft.ext.Dedup.ProductionMaxBucketSize).count()
      println(s"[pairs] $dir -> $n")
    }
    spark.stop()
  }
}

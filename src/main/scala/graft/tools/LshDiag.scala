package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostics for the LSH banding layouts (bucket occupancy,
  * candidate and result cardinality at a given SF). */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val emb = graft.Tables.embeddings(spark, dir)
      val sig = graft.ext.Similarity.withLshBands(emb, 64,
        graft.ext.Similarity.NumBands, graft.ext.Similarity.PlanesPerBand)
      val bands = sig.select(col("vec_id"), posexplode(col("bands")))
      val occ = bands.groupBy(col("pos"), col("col")).count()
        .agg(max("count").as("max_occ"), expr("percentile(count, 0.5)").as("med_occ"),
          sum(expr("count * (count - 1) / 2")).as("cand_pairs")).head()
      val out = graft.ext.Similarity.lshNearDupPairs(emb).count()
      println(s"[lsh] $dir max_occ=${occ.get(0)} med_occ=${occ.get(1)} " +
        s"cand_pairs=${occ.get(2)} result_pairs=$out")
    }
    spark.stop()
  }
}

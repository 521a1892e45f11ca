package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{SparseSim, TextAnalysis}

/**
 * Diagnostic census for the sparse-cosine inverted-index path
 * ([[SparseSim.cosinePairs]]) — the q_sparse_cosine triage the round-6
 * verdict asked for. For each testdata dir it prints, per stage:
 *
 *  - `n`            corpus size (docs)
 *  - `occ`          total shingle occurrences (posting-list input rows)
 *  - `rare`         shingles with df ∈ [minDf, maxDf] (the blocking index)
 *  - `cand_raw`     Σ df·(df−1)/2 over rare shingles — the pair rows the
 *                   posting self-join materializes BEFORE distinct
 *  - `cand`         distinct candidate pairs
 *  - `cand_docs`    docs appearing in ≥1 candidate pair (verify scope)
 *  - `verify_rows`  Σ per-pair |tf(doc1)| — rows entering the first
 *                   verify join (the stage whose growth would mark a
 *                   superlinear verify phase)
 *  - `out`          thresholded output pairs (cos ≥ minSim)
 *
 * Superlinear `cand_raw`/`cand` with linear `out` ⇒ the df-cap policy is
 * failing at scale (a PLAN problem); everything growing together with
 * `out` ⇒ the corpus genuinely holds that many similar pairs (a DATA
 * property — per-result cost is the right lens, as with LshProbe).
 *
 * Usage: runMain graft.tools.SparseProbe <sfDir> [<sfDir2> ...]
 */
object SparseProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SparseProbe <sfDir> [<sfDir2> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (minDf, maxDf, minSim) = (2, 3, 0.5)

    args.foreach { dir =>
      val docs = graft.Tables.documents(spark, dir)
      graft.functions.SketchExprs.register(spark)
      val n = docs.count()
      val hs = TextAnalysis.withTokens(docs)
        .select(col("doc_id"), expr("graft_shingle_hash(toks, 3)").as("hs"))
        .persist()
      val post = hs.select(col("doc_id"), explode(col("hs")).as("g"))
      val occ = post.count()
      val dfreq = post.groupBy(col("g")).agg(count(lit(1)).as("df")).persist()
      val rareStats = dfreq.filter(col("df").between(minDf, maxDf))
        .agg(count(lit(1)).as("rare"),
          sum(expr("df * (df - 1) DIV 2")).as("cand_raw")).head()
      val cand = SparseSim.rareShingleCandidates(docs, minDf, maxDf).persist()
      val nCand = cand.count()
      val candDocs = cand.select(col("doc1").as("doc_id"))
        .union(cand.select(col("doc2").as("doc_id"))).distinct().persist()
      val nCandDocs = candDocs.count()
      // rows entering the first verify join: each pair × |tf(doc1)|
      val tfSize = SparseSim.termCounts(docs.join(candDocs, Seq("doc_id"), "left_semi"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("ntok"))
      val verifyRows = cand.join(tfSize.withColumnRenamed("doc_id", "doc1"), "doc1")
        .agg(sum(col("ntok"))).head().getLong(0)
      val out = SparseSim.cosinePairs(docs, minDf, maxDf, minSim).count()
      println(s"[sparseprobe] dir=$dir n=$n occ=$occ " +
        s"rare=${rareStats.getAs[Long]("rare")} cand_raw=${rareStats.getAs[Long]("cand_raw")} " +
        s"cand=$nCand cand_docs=$nCandDocs verify_rows=$verifyRows out=$out")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

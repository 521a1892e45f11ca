package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing split for the PQ operator at a given SF — encode-only vs
  * ADC-join vs full query, to attribute the sf10 wall. Temporary probe.
  * Usage: runMain graft.tools.PqDiag <sfDir> */
object PqDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SketchExprs.register(spark)
    val emb = graft.Tables.embeddings(spark, sfDir)
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val m = 8
    val base = graft.ext.Similarity.withNorms(emb)
    def sub(mi: Int) =
      expr(s"slice(embedding, $mi * (size(embedding) DIV $m) + 1, size(embedding) DIV $m)")
    time("norms only") { base.select(max(col("nrm"))).count() }
    time("slices only") {
      (0 until m).foldLeft(base.select(col("vec_id"), col("embedding"))) {
        (df, mi) => df.withColumn(s"_s$mi", sub(mi))
      }.select(max(col("_s7")(0))).count()
    }
    val cacheDir = Some(sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-codebooks")
    val tag = graft.ext.Similarity.fileFingerprint(s"$sfDir/embeddings.parquet")
    import graft.ext.Similarity
    val books = (0 until m).map { mi =>
      val subEmb = base.select(col("vec_id"), sub(mi).as("embedding"))
      Similarity.trainedCodebook(subEmb, 8, 2, cacheDir, s"$tag#pq$m.$mi")
    }
    time("codebooks (cached)") { books.map(_.count()).sum }
    val codes = (0 until m).foldLeft(
      base.select(col("vec_id"), col("embedding"))) { (df, mi) =>
      df.withColumn(s"_s$mi", sub(mi))
        .withColumn(s"code$mi", Similarity.nearestCentroidColOn(books(mi),
          col(s"_s$mi"), sqrt(expr(s"graft_dot(_s$mi, _s$mi)"))))
        .drop(s"_s$mi")
    }.drop("embedding")
    time("encode only") { codes.select(max(col("code7"))).count() }
    val tabs = (0 until m).map { mi =>
      base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), sub(mi).as("q_sub"))
        .crossJoin(broadcast(books(mi)))
        .select(col("q_id"), col("cent_id").as(s"code$mi"),
          Similarity.dot("q_sub", "cent_emb").as(s"t$mi"),
          (col("cent_nrm") * col("cent_nrm")).as(s"cn2$mi"))
    }
    def chain(k: Int) = tabs.take(k).zipWithIndex.foldLeft(codes) { case (df, (tab, mi)) =>
      if (mi == 0) df.join(broadcast(tab), Seq(s"code$mi"))
      else df.join(broadcast(tab), Seq("q_id", s"code$mi"))
    }
    time("join chain k=1") { chain(1).select(max(col("t0"))).count() }
    time("join chain k=2") { chain(2).select(max(col("t1"))).count() }
    time("join chain k=4") { chain(4).select(max(col("t3"))).count() }
    val joined = chain(m).filter(col("vec_id") =!= col("q_id"))
    time("adc join chain") { joined.select(max(col("t7"))).count() }
    val codesMat = codes.persist()
    val joinedMat = tabs.zipWithIndex.foldLeft(codesMat: org.apache.spark.sql.DataFrame) {
      case (df, (tab, mi)) =>
        if (mi == 0) df.join(broadcast(tab), Seq(s"code$mi"))
        else df.join(broadcast(tab), Seq("q_id", s"code$mi"))
    }.filter(col("vec_id") =!= col("q_id"))
    time("adc join chain (codes persisted)") { joinedMat.select(max(col("t7"))).count() }
    time("adc join chain (persisted, warm)") { joinedMat.select(max(col("t6"))).count() }
    time("full pqTopK") {
      Similarity.pqTopK(emb, cacheDir = cacheDir, datasetTag = tag).count()
    }
    time("full pqTopK again") {
      Similarity.pqTopK(emb, cacheDir = cacheDir, datasetTag = tag).count()
    }
    spark.stop()
  }
}

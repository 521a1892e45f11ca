package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-factor upsampler for empirical scaling runs: builds an sf-N×
 * corpus from an existing testdata dir by writing `replicas` key-shifted
 * copies of every scaling table (dimension keys offset by a disjoint
 * range per replica, so join fan-outs and group cardinalities scale
 * linearly while per-group sizes stay constant — the shape a genuinely
 * 10× corpus would have).
 *
 * Two tables need more than key shifting, because replica-identical
 * payloads would create CROSS-REPLICA similarity structure that a real
 * 10× corpus would not have (10 identical copies of every doc → every
 * LSH bucket gains 10× members → candidate pairs grow 100×, a quadratic
 * artifact of the duplication, not of the algorithms):
 *  - documents: for replica r>0 every 3rd token is rewritten to a
 *    replica-seeded vocabulary token. Within-replica near-dup pairs are
 *    preserved (both members get the same positional rewrite), while
 *    cross-replica 3-shingle overlap drops to ~0 — per-capita near-dup
 *    density stays at the original corpus's level.
 *  - embeddings: replica r's vectors are circularly rotated by r
 *    positions. Norms and within-replica geometry (cosines, clusters)
 *    are EXACTLY preserved; cosine between a vector and its rotated
 *    copy is that of two unrelated vectors, so no cross-replica
 *    components form.
 *
 * Usage: runMain graft.tools.ScaleUp <srcDir> <destDir> [replicas=10]
 */
object ScaleUp {

  /** Disjoint id range per replica (every source key is far below this). */
  val Offset = 10000000L

  /** The corpus's 31-token vocabulary (mutation targets). */
  private val Vocab = Seq("join", "hash", "row", "batch", "scan", "customer",
    "column", "filter", "small", "slow", "merge", "order", "vector", "line",
    "data", "table", "agg", "value", "key", "stream", "window", "spark", "a",
    "group", "part", "big", "sort", "query", "fast", "the", "dup")

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dest = args(1)
    val replicas = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is TIMESTAMP(NANOS): read as long nanos (the engine's
      // Tables adapter handles a BIGINT ts identically)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = spark.range(0, replicas).select(col("id").as("_r"))
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit = {
      df.repartition(parts).write.mode("overwrite").parquet(s"$dest/$t.parquet")
      System.err.println(s"[scaleup] $t done")
    }
    /** All columns in source order, key columns shifted into replica ranges. */
    def shifted(df: DataFrame, keys: Set[String]) =
      df.columns.filterNot(_ == "_r").map { c =>
        if (keys(c)) (col(c) + col("_r") * Offset).as(c) else col(c)
      }

    // fixed dimensions: straight copy
    Seq("region", "nation").foreach(t => write(read(t), t, 1))

    def scale(t: String, keys: Set[String], parts: Int): Unit = {
      val df = read(t).crossJoin(reps)
      write(df.select(shifted(df, keys): _*), t, parts)
    }

    scale("customer", Set("c_custkey"), 4)
    scale("supplier", Set("s_suppkey"), 2)
    scale("part", Set("p_partkey"), 2)
    scale("orders", Set("o_orderkey", "o_custkey"), 8)
    scale("lineitem", Set("l_orderkey", "l_partkey", "l_suppkey"), 16)
    scale("events", Set("event_id", "user_id"), 8)

    // documents: key shift + per-replica token rewrite (see scaladoc)
    val vocabArr = Vocab.map(t => s"'$t'").mkString("array(", ", ", ")")
    val docs = read("documents").crossJoin(reps)
      .withColumn("text", expr(
        s"""CASE WHEN _r = 0 THEN text ELSE
           |  concat_ws(' ', transform(split(trim(text), '\\\\s+'),
           |    (t, i) -> IF(i % 3 = 0,
           |      element_at($vocabArr, CAST(1 + (i + 7 * _r) % ${Vocab.size} AS INT)),
           |      t))) END""".stripMargin))
      .withColumn("n_chars",
        when(col("_r") === 0, col("n_chars")).otherwise(length(col("text"))))
      .select((col("doc_id") + col("_r") * Offset).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    write(docs, "documents", 4)

    // embeddings: key shift + per-replica circular rotation (see scaladoc)
    val emb = read("embeddings").crossJoin(reps)
      .withColumn("dim", size(col("embedding")))
      .withColumn("rot", (col("_r") % col("dim")).cast("int"))
      .withColumn("embedding", expr(
        """IF(rot = 0, embedding,
          |  concat(slice(embedding, rot + 1, dim - rot), slice(embedding, 1, rot)))"""
          .stripMargin))
      .select((col("vec_id") + col("_r") * Offset).as("vec_id"),
        col("embedding"), col("label"))
    write(emb, "embeddings", 4)

    spark.stop()
  }
}

package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sparse count-vector cosine similarity with inverted-index blocking —
 * the term-space complement to the embedding-space ANN family
 * ([[Similarity]]): candidate pairs come from an inverted index over
 * LOW-document-frequency shingles (two docs sharing a rare 3-gram are
 * plausibly related), and the exact cosine is then evaluated on full
 * term-frequency vectors for the candidates only.
 *
 * Scale shape: the blocking index keeps only shingles with
 * df ∈ [2, maxDf], so every posting list is ≤ maxDf long and the
 * pair-generating self-join does ≤ |vocab|·maxDf² work — a CONSTANT per
 * shingle, independent of corpus size (boilerplate shingles shared by
 * millions of docs are exactly the ones the df cap drops; they carry no
 * pairing signal). The verify join is keyed on (doc, token) — never a
 * cross product. Determinism: dot products are exact integer sums; the
 * only floating-point ops are sqrt / multiply / divide, each a single
 * correctly-rounded IEEE op, so scores are bit-identical across engines.
 */
object SparseSim {

  /** Per-document term-frequency vector in long form: (doc_id, tok, cnt). */
  def termCounts(docs: DataFrame): DataFrame =
    TextAnalysis.withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))

  /**
   * Candidate pairs from the rare-shingle inverted index: distinct
   * (doc1 < doc2) sharing at least one shingle with df ∈ [minDf, maxDf].
   */
  def rareShingleCandidates(docs: DataFrame, minDf: Int = 2, maxDf: Int = 3): DataFrame = {
    // posting list (doc_id, shingle); persist — the df aggregate and the
    // pair join both consume it, and shingling is the expensive stage
    val post = TextAnalysis.withShingles(docs)
      .select(col("doc_id"), explode(col("shingles")).as("g")).persist()
    val rare = post.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(minDf, maxDf)).select("g")
    val rp = post.join(rare, "g")
    rp.select(col("g"), col("doc_id").as("doc1"))
      .join(rp.select(col("g").as("g2"), col("doc_id").as("doc2")),
        col("g") === col("g2") && col("doc1") < col("doc2"))
      .select("doc1", "doc2").distinct()
  }

  /**
   * Exact cosine over token-count vectors for the blocked candidates:
   * (doc1, doc2, dot, cos_sim) with cos_sim ≥ minSim. `dot` is the exact
   * integer ⟨tf₁, tf₂⟩; `cos_sim` = dot / (‖tf₁‖·‖tf₂‖).
   */
  def cosinePairs(docs: DataFrame, minDf: Int = 2, maxDf: Int = 3,
                  minSim: Double = 0.5): DataFrame = {
    val tf = termCounts(docs).persist()
    val norms = tf.groupBy(col("doc_id"))
      .agg(expr("sqrt(CAST(sum(cnt * cnt) AS DOUBLE))").as("nrm"))
    val cand = rareShingleCandidates(docs, minDf, maxDf)
    val dots = cand
      .join(tf.select(col("doc_id").as("doc1"), col("tok"), col("cnt").as("c1")), "doc1")
      .join(tf.select(col("doc_id").as("doc2"), col("tok"), col("cnt").as("c2")),
        Seq("doc2", "tok"))
      .groupBy(col("doc1"), col("doc2"))
      .agg(sum(col("c1") * col("c2")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc1"), col("nrm").as("nrm1")), "doc1")
      .join(norms.select(col("doc_id").as("doc2"), col("nrm").as("nrm2")), "doc2")
      .withColumn("cos_sim", col("dot").cast("double") / (col("nrm1") * col("nrm2")))
      .filter(col("cos_sim") >= minSim)
      .select("doc1", "doc2", "dot", "cos_sim")
  }
}

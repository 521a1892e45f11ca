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
 * pairing signal). Both the posting list and the term vectors are keyed
 * on the compiled portable 32-bit hashes (`graft_shingle_hash` /
 * `graft_token_hash` — one codegen'd pass, integer shuffle keys instead
 * of strings), and term vectors are materialized ONLY for docs that
 * appear in a candidate pair (a semi join, so the full-corpus tokenize →
 * explode → count never runs; this cut the sf0.1 bench cost ~6×). The
 * verify join is keyed on (doc, token) — never a cross product.
 * Determinism: dot products are exact integer sums; the only
 * floating-point ops are sqrt / multiply / divide, each a single
 * correctly-rounded IEEE op, so scores are bit-identical across engines.
 * Hash collisions (32-bit) merge identically on both engines.
 */
object SparseSim {

  /** Per-document term-frequency vector in long form over HASHED tokens:
    * (doc_id, tok, cnt) with multiplicity preserved before the count. */
  def termCounts(docs: DataFrame): DataFrame = {
    graft.functions.SketchExprs.register(docs.sparkSession)
    TextAnalysis.withTokens(docs)
      .select(col("doc_id"), explode(expr("graft_token_hash(toks)")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
  }

  /**
   * Candidate pairs from the rare-shingle inverted index: distinct
   * (doc1 < doc2) sharing at least one shingle with df ∈ [minDf, maxDf].
   */
  def rareShingleCandidates(docs: DataFrame, minDf: Int = 2, maxDf: Int = 3): DataFrame = {
    graft.functions.SketchExprs.register(docs.sparkSession)
    // persist the COMPACT (doc_id, hashed-shingle-array) frame — one
    // hashing pass over the corpus; the three posting consumers (df
    // aggregate + both pair-join branches) re-explode from cache, which
    // is far cheaper than materializing the exploded posting list
    // (the decontaminate pattern)
    val hs = TextAnalysis.withTokens(docs)
      .select(col("doc_id"), expr("graft_shingle_hash(toks, 3)").as("hs"))
      .persist()
    val post = hs.select(col("doc_id"), explode(col("hs")).as("g"))
    val rare = post.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(minDf, maxDf)).select("g")
    val rp = post.join(rare, "g")
    rp.select(col("g"), col("doc_id").as("doc1"))
      .join(rp.select(col("g").as("g2"), col("doc_id").as("doc2")),
        col("g") === col("g2") && col("doc1") < col("doc2"))
      .select("doc1", "doc2").distinct()
  }

  /**
   * Exact Jaccard similarity join via PREFIX FILTERING (the ppjoin family)
   * — the candidate-generation guarantee is exact, unlike the sketch
   * blockers: order each doc's distinct tokens rarest-first (global df,
   * token value as tiebreak) and index only the first
   * |d| − ⌈t·|d|⌉ + 1 tokens. Two sets with Jaccard ≥ t MUST share a
   * prefix token (pigeonhole), so recall is 100 % and the verification
   * Jaccard is exact — this is the similarity JOIN; the sketch family
   * trades recall for cost.
   *
   * Scale shape: only prefixes are exploded into the index — posting
   * lists are per-RARE-token (boilerplate tokens sort last and rarely
   * enter a prefix), the standard reason prefix filtering beats all-pairs
   * at corpus scale. Candidate verification joins on (doc, token), never
   * a cross product. `jaccard` = one IEEE division of exact integers.
   */
  def prefixJaccardPairs(docs: DataFrame, threshold: Double = 0.6): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold must be in (0,1], got $threshold")
    graft.functions.SketchExprs.register(docs.sparkSession)
    // distinct hashed tokens per doc; consumed by df-agg, prefix, and the
    // verify join → persist once
    val toks = TextAnalysis.withTokens(docs)
      .select(col("doc_id"), explode(expr("graft_token_hash(toks)")).as("tok"))
      .distinct().persist()
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val prefix = toks
      .join(dfreq, "tok")
      .join(sizes, "doc_id")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))))
      .filter(col("rn") <= col("sz") - expr(s"CAST(ceil($threshold * sz) AS BIGINT)") + 1)
      .select(col("doc_id"), col("tok"))
    val cand = prefix.select(col("tok"), col("doc_id").as("doc1"))
      .join(prefix.select(col("tok").as("tok2"), col("doc_id").as("doc2")),
        col("tok") === col("tok2") && col("doc1") < col("doc2"))
      .select("doc1", "doc2").distinct()
    val inter = cand
      .join(toks.select(col("doc_id").as("doc1"), col("tok")), "doc1")
      .join(toks.select(col("doc_id").as("doc2"), col("tok")), Seq("doc2", "tok"))
      .groupBy(col("doc1"), col("doc2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc1"), col("sz").as("sz1")), "doc1")
      .join(sizes.select(col("doc_id").as("doc2"), col("sz").as("sz2")), "doc2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc1", "doc2", "inter", "jaccard")
  }

  /**
   * Exact cosine over token-count vectors for the blocked candidates:
   * (doc1, doc2, dot, cos_sim) with cos_sim ≥ minSim. `dot` is the exact
   * integer ⟨tf₁, tf₂⟩; `cos_sim` = dot / (‖tf₁‖·‖tf₂‖).
   */
  def cosinePairs(docs: DataFrame, minDf: Int = 2, maxDf: Int = 3,
                  minSim: Double = 0.5): DataFrame = {
    val cand = rareShingleCandidates(docs, minDf, maxDf).persist()
    // term vectors ONLY for docs in a candidate pair — the semi join keeps
    // the expensive explode+count off the full corpus (and dedupes, so no
    // distinct here)
    val candDocs = cand.select(col("doc1").as("doc_id"))
      .union(cand.select(col("doc2").as("doc_id")))
    // the norm rides along as a doc-partitioned window over the tf frame —
    // the dots aggregate then carries it (constant per group, min() for
    // determinism), saving two join stages over a separate norms frame;
    // the VALUE is identical, so the oracle keeps the plain-join form
    val tf = termCounts(docs.join(candDocs, Seq("doc_id"), "left_semi"))
      .withColumn("nrm", expr("sqrt(CAST(sum(cnt * cnt) OVER (PARTITION BY doc_id) AS DOUBLE))"))
      .persist()
    cand
      .join(tf.select(col("doc_id").as("doc1"), col("tok"),
        col("cnt").as("c1"), col("nrm").as("nrm1")), "doc1")
      .join(tf.select(col("doc_id").as("doc2"), col("tok"),
        col("cnt").as("c2"), col("nrm").as("nrm2")),
        Seq("doc2", "tok"))
      .groupBy(col("doc1"), col("doc2"))
      .agg(sum(col("c1") * col("c2")).as("dot"),
        min(col("nrm1")).as("nrm1"), min(col("nrm2")).as("nrm2"))
      .withColumn("cos_sim", col("dot").cast("double") / (col("nrm1") * col("nrm2")))
      .filter(col("cos_sim") >= minSim)
      .select("doc1", "doc2", "dot", "cos_sim")
  }
}

package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph centrality over the near-duplicate candidate graph — a
 * dedup-pipeline primitive: when a duplicate cluster must elect one
 * canonical document, degree/PageRank centrality picks the "most
 * connected" member (the best-linked copy) rather than an arbitrary id.
 *
 * The rank is computed in INTEGER micro-units (scale 10^12) with only
 * multiplication, addition and floor division — every engine floors
 * positive integer division identically, so a fixed iteration count gives
 * bit-identical ranks in Spark and the DuckDB oracle (the same
 * no-libm-drift rule as q_priority_sample; double-valued PageRank would
 * differ in the ulp on every engine pair because the in-neighbor sums
 * reduce in different orders).
 *
 * Scale shape: one localCheckpoint of the (small) edge list, then per
 * iteration exactly one keyed join (edges ⋈ contributions, shuffled on
 * the node key) and one hash aggregate — the canonical distributed
 * PageRank step. State per iteration is one row per touched node; the
 * full corpus is never re-scanned after edge generation. Lineage grows
 * linearly in the iteration count (each round references the previous
 * ranks once), so no per-round checkpointing is needed at a fixed small
 * iteration budget. localCheckpoint blocks are reclaimed with the
 * session's cache (caller-owned, the [[SparseSim]] contract).
 */
object GraphRank {

  /** 10^12 integer micro-rank units — headroom: total mass stays ≤ scale,
    * so 85·insum ≤ 8.5·10^13, far under Long.MaxValue. */
  val Scale: Long = 1000000000000L

  /** Damping 0.85 expressed as the integer pair (85, 100). */
  private val DampNum = 85
  private val DampDen = 100

  /**
   * Fixed-iteration integer PageRank over an undirected pair list
   * (`doc1 < doc2`, distinct — e.g. [[Dedup.minhashCandidatePairs]]).
   * Pairs are symmetrized; only edge-touched nodes participate (isolated
   * docs have no centrality to rank). Every touched node has in- and
   * out-degree ≥ 1, so there is no dangling-mass term.
   *
   * Returns (doc_id, degree, rank_int): degree = symmetrized out-degree,
   * rank_int = rank after `iters` rounds in micro-units of `scale`.
   */
  def pagerankFromPairs(pairs: DataFrame, iters: Int = 3, scale: Long = Scale): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // truncate the candidate-generation lineage ONCE; the loop below joins
    // this edge list every round and must not re-run the sketch pipeline
    // (cluster equivalent: write the edge table)
    val e = pairs.select(col("doc1"), col("doc2")).localCheckpoint(true)
    val sym = e.select(col("doc1").as("src"), col("doc2").as("dst"))
      .union(e.select(col("doc2").as("src"), col("doc1").as("dst")))
    // (node, outdeg, n) — n broadcast from a 1-row agg, never collected
    val deg = sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val base = deg.crossJoin(broadcast(deg.agg(count(lit(1)).as("n"))))
      .localCheckpoint(true)
    val teleport = s"($DampDen - $DampNum) * (${scale}L DIV n)"
    var rank = base.withColumn("rank", expr(s"${scale}L DIV n"))
    for (_ <- 1 to iters) {
      val contrib = rank.select(col("node").as("src"),
        expr("rank DIV outdeg").as("contrib"))
      val insum = sym.join(contrib, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("contrib")).as("insum"))
      rank = base.join(insum, "node")
        .withColumn("rank",
          expr(s"($teleport) DIV $DampDen + ($DampNum * insum) DIV $DampDen"))
        .select(col("node"), col("outdeg"), col("n"), col("rank"))
    }
    rank.select(col("node").as("doc_id"), col("outdeg").as("degree"),
      col("rank").as("rank_int"))
  }

  /** PageRank centrality of every document in the MinHash near-dup
    * candidate graph (the canonical-pick signal). */
  def docCentrality(docs: DataFrame, iters: Int = 3): DataFrame =
    pagerankFromPairs(
      Dedup.minhashCandidatePairs(docs).select("doc1", "doc2"), iters)

  /**
   * Per-node triangle count + local clustering coefficient over an
   * undirected pair list (`doc1 < doc2`, distinct) — the cluster-density
   * signal: a near-dup component whose members form many triangles is a
   * tight duplicate cluster; a triangle-free one is a chain of borderline
   * matches.
   *
   * Compact-forward enumeration: edges are already oriented by id, so each
   * triangle a<b<c is produced exactly once by the two keyed joins
   * (wedge (a,b)+(b,c), closed by (a,c)). Work is Σ deg(b)·deg_out(b) per
   * middle vertex — the id orientation bounds it on the candidate graphs
   * this runs on because their buckets are capped upstream
   * ([[Dedup.capBuckets]]); on an uncapped power-law graph, orient by
   * (degree, id) instead. `clustering` = 2T / (d·(d−1)) — one IEEE
   * division of exact integers.
   */
  def triangleStats(pairs: DataFrame): DataFrame = {
    // the edge list feeds three self-joins + the degree agg: truncate the
    // candidate-generation lineage once (cluster equivalent: a temp table)
    val e = pairs.select(col("doc1"), col("doc2")).localCheckpoint(true)
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.doc2") === col("bc.doc1"))
      .join(e.as("ac"),
        col("ac.doc1") === col("ab.doc1") && col("ac.doc2") === col("bc.doc2"))
      .select(col("ab.doc1").as("a"), col("ab.doc2").as("b"), col("bc.doc2").as("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("triangles"))
    val deg = e.select(col("doc1").as("doc_id"))
      .union(e.select(col("doc2").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
    deg.join(perNode, Seq("doc_id"), "left")
      .withColumn("triangles", coalesce(col("triangles"), lit(0L)))
      .withColumn("clustering", when(col("degree") >= 2,
        (col("triangles") * 2).cast("double") /
          (col("degree") * (col("degree") - 1)).cast("double"))
        .otherwise(lit(0.0)))
      .select("doc_id", "degree", "triangles", "clustering")
  }

  /** Triangle stats of the MinHash near-dup candidate graph. */
  def docTriangles(docs: DataFrame): DataFrame =
    triangleStats(Dedup.minhashCandidatePairs(docs).select("doc1", "doc2"))
}

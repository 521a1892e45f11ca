package graft

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

class ExtSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs far away home", "en"),
    (1L, "the quick brown fox jumps over the lazy dog and runs far away now", "en"),  // near-dup of 0
    (2L, "completely different words about spark shuffles and partitions here yes", "en"),
    (3L, "the quick brown fox jumps over the lazy dog and runs far away home", "en")) // exact dup of 0
    .toDF("doc_id", "text", "lang")

  test("exact dedup groups duplicates under the minimum doc_id") {
    val groups = Dedup.exactGroups(docs).collect()
    assert(groups.length === 3)
    val dup = groups.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_doc_id") === 0L)
  }

  test("minhash LSH finds the planted near-duplicate pair, not the unrelated doc") {
    val pairs = Dedup.minhashCandidatePairs(docs).collect()
      .map(r => (r.getAs[Long]("doc1"), r.getAs[Long]("doc2"), r.getAs[Double]("est_jaccard")))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)))   // near-dup found
    assert(keys.contains((0L, 3L)))   // exact dup found with est 1.0
    assert(pairs.find(p => (p._1, p._2) == (0L, 3L)).get._3 === 1.0)
    assert(!keys.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated not pulled in
  }

  test("exact jaccard on candidates: identical docs -> 1.0") {
    val j = Dedup.ngramJaccardOnCandidates(docs).collect()
      .find(r => r.getAs[Long]("doc1") == 0L && r.getAs[Long]("doc2") == 3L).get
    assert(j.getAs[Double]("jaccard") === 1.0)
  }

  test("simhash: identical docs get identical sketches, hamming 0") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 10).collect()
      .map(r => ((r.getAs[Long]("doc1"), r.getAs[Long]("doc2")), r.getAs[Int]("hamming"))).toMap
    assert(pairs((0L, 3L)) === 0)
  }

  test("minhash bucket cap drops degenerate buckets, bounding pair work") {
    // cap=1: every bucket with >=2 docs (i.e. every candidate source) dropped
    val capped = Dedup.minhashCandidatePairs(docs, maxBucketSize = Some(1)).count()
    assert(capped === 0L)
    // no cap: the duplicate pairs are found
    assert(Dedup.minhashCandidatePairs(docs).count() > 0L)
  }

  test("language ID picks the dictionary with most hits") {
    val d = Seq(
      (0L, "le chat et les chiens est dans le jardin", "fr"),
      (1L, "the dog and the cat of the house is big", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(d).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("predicted_lang") === "fr")
    assert(out(1).getAs[String]("predicted_lang") === "en")
  }

  test("cosine similarity: duplicate vector ranks first with cosine 1.0") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f)),      // duplicate of 0
      (2L, Array(-3.0f, 0.5f, 1.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, numQueries = 1, k = 3).collect()
    assert(top.head.getAs[Long]("c_id") === 1L)
    assert(math.abs(top.head.getAs[Double]("cosine") - 1.0) < 1e-12)
  }

  test("multimodal decode stub: deterministic features, correct byte counts") {
    val media = Multimodal.mediaFromDocuments(docs)
    val feats = Multimodal.decodeStub(spark, media).collect().sortBy(_.doc_id)
    assert(feats.length === 4)
    assert(feats.head.n_bytes === docs.collect().head.getAs[String]("text").getBytes.length)
    assert(feats.head.feature.length === 8)
    // identical payloads -> identical features (deterministic stub)
    assert(feats(0).feature.toSeq === feats(3).feature.toSeq)
    assert(feats(0).feature.toSeq !== feats(2).feature.toSeq)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

import graft.functions.BloomMightContain
import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom semi join equals plain left_semi (false positives verified away)") {
    val rnd = new scala.util.Random(7)
    val big = (1L to 5000L).map(i => (i, rnd.nextInt(100))).toDF("k", "payload")
    // small side: a sparse subset, plus keys ABSENT from big (must not resurrect rows)
    val small = (1L to 5000L).filter(_ % 37 == 0).map(i => (i, "x")).toDF("sk", "tag")
      .union(Seq((999999L, "x"), (888888L, "x")).toDF("sk", "tag"))
    val got = BloomJoin.semiJoin(big, small, "k", "sk", expectedItems = 256)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getInt(1)))
    val want = big.join(small, col("k") === col("sk"), "left_semi")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("bloom probe has no false negatives; tiny sketch still yields exact results") {
    // expectedItems deliberately far under the true cardinality: the
    // saturated sketch passes nearly everything (worthless prefilter) but
    // the verify join must keep the result exact
    val big = (1L to 2000L).toDF("k")
    val small = (1L to 2000L).filter(_ % 3 == 0).toDF("sk")
    val n = BloomJoin.semiJoin(big, small, "k", "sk", expectedItems = 4, fpp = 0.5).count()
    assert(n === 2000 / 3)
  }

  test("auto-sized sketch (default expectedItems) is exact and actually filters") {
    val big = (1L to 20000L).toDF("k")
    val small = (1L to 20000L).filter(_ % 50 == 0).toDF("sk")
    // default sizing counts the build side (400 keys) instead of trusting a
    // guess — the regime where a stale 1<<18-style constant either saturates
    // (undersized) or wastes broadcast bytes (oversized)
    val got = BloomJoin.semiJoin(big, small, "k", "sk")
    assert(got.count() === 20000 / 50)
    // the probe must prefilter: with a right-sized sketch at fpp=0.01 the
    // bloom pass alone keeps ~matches + 1% of non-matches, far below big
    val bloom = small.stat.bloomFilter(xxhash64(col("sk")), small.count(), 0.01)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bloom.writeTo(b); b.toByteArray }
    val probed = big.filter(
      Shim.column(BloomMightContain(Shim.expression(xxhash64(col("k"))), bytes))).count()
    assert(probed < 2000, s"right-sized sketch should drop ~99% of non-matches, kept $probed")
  }

  test("BloomMightContain expression: membership true for inserted keys, codegen = interpreted") {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (1L to 50L).foreach(bloom.putLong)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bloom.writeTo(b); b.toByteArray }
    val df = (1L to 200L).toDF("v")
    val probe = Shim.column(BloomMightContain(Shim.expression(col("v")), bytes))
    val kept = df.filter(probe).collect().map(_.getLong(0)).toSet
    // no false negatives on 1..50; FPs beyond allowed but bounded in practice
    assert((1L to 50L).forall(kept.contains))
    assert(kept.size < 150) // the sketch genuinely filters
    // null-safety: null input row survives the expression (predicate is null → filtered)
    val withNull = Seq[java.lang.Long](1L, null).toDF("v")
    assert(withNull.filter(probe).count() === 1)
  }
}

package graft

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions._

/**
 * Interpreted-`eval` vs generated-code parity fuzz over the whole custom
 * expression inventory.
 *
 * Why a dedicated rig: Catalyst runs the SAME expression through two
 * independent code paths — `eval(InternalRow)` (constant folding at
 * optimize time, `InterpretedProjection`, filter pushdown simplification)
 * and the Java emitted by `doGenCode` (whole-stage codegen at runtime). A
 * divergence is invisible to every DataFrame-level test that exercises
 * only one path: a literal argument silently constant-folds through
 * `eval` while the data path runs generated code, and the two results
 * disagree per-plan, not per-test. The existing specs pin each
 * expression's SEMANTICS (vs a built-in reference form, point edges, or a
 * DuckDB oracle); this spec pins the two execution paths to EACH OTHER on
 * generated input, including the hand-written inline codegen bodies
 * (DotProductFloat, SimHash32, MinHashSignature, NearestCentroid,
 * ZOrder2, BloomMightContain, the header null-wrap branches) where the
 * Java is a reimplementation, not a call into the shared kernel.
 *
 * Expressions whose codegen delegates to the same static helper as eval
 * (HashedShingles, WhitespaceTokens, …) are included too: parity is by
 * construction TODAY, and this spec is the tripwire if one of them is
 * ever rewritten inline for speed.
 *
 * Method: bind the expression over `BoundReference`s, evaluate each
 * generated row once interpreted and once through
 * `GenerateUnsafeProjection` (real Janino-compiled codegen, same
 * generator whole-stage uses for projections), and compare in Scala
 * space with NaN-tolerant equality. Null inputs ride along in every
 * corpus — the `nullSafeCodeGen` null-propagation branch is itself
 * generated code under test.
 */
class ExprParityFuzzSpec extends SparkSpec {

  // --- rig -----------------------------------------------------------

  /** NaN-tolerant deep normalization for comparison (ScalaTest === treats
    * NaN != NaN; both paths must agree on WHERE the NaNs are). */
  private def norm(v: Any): Any = v match {
    case d: Double if d.isNaN => "NaN"
    case f: Float if f.isNaN  => "NaN"
    case s: Seq[_]            => s.map(norm)
    case r: org.apache.spark.sql.Row => r.toSeq.map(norm)
    case b: Array[Byte]       => b.toSeq
    case x => x
  }

  /** Runs every row through interpreted eval and generated code, asserts
    * equality. Rows are SCALA-space values (String/Seq/Long/…), nulls
    * allowed anywhere. */
  private def assertParity(expr: Expression, inputTypes: Seq[DataType],
                           rows: Seq[Seq[Any]]): Unit = {
    val check = expr.checkInputDataTypes()
    assert(check.isSuccess, s"input type check failed: $check")
    val toCat = inputTypes.map(CatalystTypeConverters.createToCatalystConverter)
    val toScala = CatalystTypeConverters.createToScalaConverter(expr.dataType)
    val projection = GenerateUnsafeProjection.generate(Seq(expr))
    rows.zipWithIndex.foreach { case (r, idx) =>
      assert(r.length == inputTypes.length, s"row #$idx arity")
      val row = InternalRow.fromSeq(r.zip(toCat).map { case (v, c) => c(v) })
      val interp = toScala(expr.eval(row))
      val out = projection(row)
      val gen = if (out.isNullAt(0)) null else toScala(out.get(0, expr.dataType))
      assert(norm(interp) === norm(gen),
        s"eval/codegen divergence on row #$idx $r: interpreted=$interp generated=$gen ($expr)")
    }
  }

  private def in(i: Int, dt: DataType) = BoundReference(i, dt, nullable = true)

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i => g(Gen.Parameters.default, Seed(seed + i)))

  // --- input generators ----------------------------------------------

  private val floatVal: Gen[Float] = Gen.oneOf(
    Gen.const(0f), Gen.const(-0f), Gen.const(1f), Gen.const(-1f),
    Gen.const(Float.NaN), Gen.const(Float.PositiveInfinity),
    Gen.const(Float.NegativeInfinity), Gen.const(Float.MinPositiveValue),
    Gen.const(3.4e38f), Gen.chooseNum(-100f, 100f))

  private def floatArr(maxLen: Int): Gen[Seq[Float]] =
    Gen.choose(0, maxLen).flatMap(n => Gen.listOfN(n, floatVal))

  private val longBox: Gen[java.lang.Long] = Gen.oneOf(
    Gen.const(null.asInstanceOf[java.lang.Long]),
    Gen.oneOf[java.lang.Long](0L, 1L, -1L, Long.MaxValue, Long.MinValue,
      4294967311L, 2147483648L),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(java.lang.Long.valueOf))

  private def longArr(maxLen: Int): Gen[Seq[java.lang.Long]] =
    Gen.choose(0, maxLen).flatMap(n => Gen.listOfN(n, longBox))

  private val token: Gen[String] = Gen.oneOf(
    Gen.const(null.asInstanceOf[String]), Gen.const(""), Gen.const(" "),
    Gen.const("a b"), // embedded space: collides with BPE's fused-token shape
    Gen.oneOf("a", "b", "ab", "tok", "café", "中文", "ß", ".", "A"),
    Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString))

  private def strArr(maxLen: Int): Gen[Seq[String]] =
    Gen.choose(0, maxLen).flatMap(n => Gen.listOfN(n, token))

  /** Text with PII-shaped fragments, whitespace runs, unicode — shared by
    * the tokenizer and scrubber corpora. */
  private val text: Gen[String] = {
    val piece = Gen.oneOf(
      Gen.oneOf(" ", "\t", "\n", "", "  "),
      Gen.oneOf("user@host.com", "bob@", "@x.y", "a.b@c.d.e", "x@@y"),
      Gen.oneOf("555-867-5309", "123", "12345678901234567890", "+1 222 333"),
      Gen.oneOf("word", "WoRd", "café", "straße", "中文", "İstanbul", "."),
      Gen.const("😀"))
    Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, piece)).map(_.mkString)
  }

  private val rawBytes: Gen[Array[Byte]] = {
    val magic = Gen.oneOf(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A),
      "RIFF".getBytes("US-ASCII"), "BM".getBytes("US-ASCII"),
      "WAVE".getBytes("US-ASCII"), Array.emptyByteArray)
    for {
      m <- magic
      n <- Gen.choose(0, 64)
      tail <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield m ++ tail.toArray
  }

  // --- the hand-written inline codegen bodies -------------------------

  test("DotProductFloat: eval == codegen on equal/ragged/empty/NaN/Inf pairs") {
    val pair: Gen[(Seq[Float], Seq[Float])] = Gen.oneOf(
      // same length (the production shape)
      Gen.choose(0, 6).flatMap(n =>
        Gen.zip(Gen.listOfN(n, floatVal), Gen.listOfN(n, floatVal))),
      // independent lengths: ragged -> null on BOTH paths
      Gen.zip(floatArr(6), floatArr(6)))
    val rows = samples(pair, 400, 9100L).map { case (a, b) => Seq(a, b) } ++
      Seq(Seq(null, Seq(1f)), Seq(Seq(1f), null), Seq(null, null), Seq(Nil, Nil))
    assertParity(
      DotProductFloat(in(0, ArrayType(FloatType, false)), in(1, ArrayType(FloatType, false))),
      Seq(ArrayType(FloatType, false), ArrayType(FloatType, false)), rows)
  }

  test("SimHash32: eval == codegen incl. null hashes and extreme longs") {
    val rows = samples(longArr(10), 400, 9200L).map(Seq(_)) ++
      Seq(Seq(null), Seq(Nil), Seq(Seq[java.lang.Long](null, null)))
    assertParity(SimHash32(in(0, ArrayType(LongType, true))),
      Seq(ArrayType(LongType, true)), rows)
  }

  test("MinHashSignature: eval == codegen incl. null hashes, empty, extremes") {
    val rows = samples(longArr(10), 400, 9300L).map(Seq(_)) ++
      Seq(Seq(null), Seq(Nil), Seq(Seq[java.lang.Long](null)),
        Seq(Seq[java.lang.Long](Long.MaxValue, Long.MinValue, 0L)))
    assertParity(MinHashSignature(in(0, ArrayType(LongType, true))),
      Seq(ArrayType(LongType, true)), rows)
  }

  test("NearestCentroid: eval == codegen on ties/ragged/zero-norm/NaN fuzz") {
    // codebook with an exact-duplicate pair (tie) and a ragged centroid —
    // every REPRESENTABLE branch of the fold. A zero/NaN/Inf CENTROID norm
    // is rejected at Codebook construction (pinned below), so the fuzz
    // exercises degenerate norms only on the ROW side (nrmGen).
    val cb = new Codebook(
      Array(2L, 5L, 7L, 9L),
      Array(Array(1f, 0f, 0f, 0f), Array(1f, 0f, 0f, 0f),
        Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f)),
      Array(1.0, 1.0, 1.0, 1.0))
    // construction-time rejection of degenerate codebook norms: zero, NaN,
    // +Inf each abort — the throw-vs-silent-skip divergence vs the window
    // form is unrepresentable, not merely untested
    for (bad <- Seq(0.0, -1.0, Double.NaN, Double.PositiveInfinity)) {
      val e = intercept[IllegalArgumentException] {
        new Codebook(Array(1L, 2L), Array(Array(1f, 0f), Array(0f, 1f)),
          Array(1.0, bad))
      }
      assert(e.getMessage.contains("positive finite"), s"norm=$bad")
    }
    val nrmGen: Gen[java.lang.Double] = Gen.oneOf[java.lang.Double](
      1.0, 0.0, -1.0, Double.NaN, Double.PositiveInfinity, 1e-300, 1e300)
    val row: Gen[Seq[Any]] = for {
      emb <- Gen.oneOf(Gen.listOfN(4, floatVal).map(x => x: Seq[Float]), floatArr(6))
      nrm <- nrmGen
    } yield Seq(emb, nrm)
    val rows = samples(row, 400, 9400L) ++ Seq(
      Seq(null, java.lang.Double.valueOf(1.0)), Seq(Seq(1f, 0f, 0f, 0f), null),
      Seq(Nil, java.lang.Double.valueOf(1.0))) // dim 0: no centroid matches -> fallback id
    assertParity(
      NearestCentroid(in(0, ArrayType(FloatType, false)), in(1, DoubleType), cb),
      Seq(ArrayType(FloatType, false), DoubleType), rows)
  }

  test("ZOrder2: eval == codegen across the full long range incl. sign bits") {
    val lv: Gen[java.lang.Long] = Gen.oneOf(
      Gen.oneOf[java.lang.Long](0L, 1L, -1L, Long.MaxValue, Long.MinValue,
        2147483647L, 2147483648L, -2147483648L, 0x5555555555555555L),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(java.lang.Long.valueOf))
    val rows = samples(Gen.zip(lv, lv), 500, 9500L).map { case (a, b) => Seq(a, b) } ++
      Seq(Seq(null, 1L: java.lang.Long), Seq(1L: java.lang.Long, null))
    assertParity(ZOrder2(in(0, LongType), in(1, LongType)), Seq(LongType, LongType), rows)
  }

  test("BloomMightContain: eval == codegen on members, non-members, extremes") {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    val members = (0L until 500L).map(_ * 7919L)
    members.foreach(bloom.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val sk = new SketchBytes(bos.toByteArray)
    val probe: Gen[java.lang.Long] = Gen.oneOf(
      Gen.oneOf(members.map(java.lang.Long.valueOf)),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(java.lang.Long.valueOf),
      Gen.oneOf[java.lang.Long](0L, -1L, Long.MaxValue, Long.MinValue))
    val rows = samples(probe, 600, 9600L).map(Seq(_)) :+ Seq(null)
    assertParity(BloomMightContain(in(0, LongType), sk), Seq(LongType), rows)
  }

  test("image/audio header null-wrap branches: eval == codegen on hostile binaries") {
    val rows = samples(rawBytes, 300, 9700L).map(Seq[Any](_)) ++
      Seq(Seq(null), Seq(Array.emptyByteArray))
    assertParity(ImageFormat(in(0, BinaryType)), Seq(BinaryType), rows)
    (ImageHeader.Width to ImageHeader.Channels).foreach { sel =>
      assertParity(ImageHeaderInt(in(0, BinaryType), sel), Seq(BinaryType), rows)
    }
    (WavHeader.Channels to WavHeader.DataBytes).foreach { sel =>
      assertParity(WavHeaderInt(in(0, BinaryType), sel), Seq(BinaryType), rows)
    }
  }

  // --- delegating expressions: refactor tripwires ----------------------

  test("delegating kernels stay on one code path: tokens/shingles/scrub/BPE/counts/LSH") {
    val strRows = samples(strArr(8), 300, 9800L).map(Seq(_)) ++
      Seq(Seq(null), Seq(Nil), Seq(Seq[String](null, null)))
    assertParity(HashedTokens(in(0, ArrayType(StringType, true))),
      Seq(ArrayType(StringType, true)), strRows)
    assertParity(HashedShingles(in(0, ArrayType(StringType, true)), 3),
      Seq(ArrayType(StringType, true)), strRows)
    assertParity(RepetitionStats(in(0, ArrayType(StringType, true)), 2),
      Seq(ArrayType(StringType, true)), strRows)
    assertParity(CountInSet(in(0, ArrayType(StringType, true)),
      Seq("a", "tok", "café", "", "a b")), Seq(ArrayType(StringType, true)), strRows)
    assertParity(ApplyBpeMerges(in(0, ArrayType(StringType, true)),
      Seq("a" -> "b", "a b" -> "ab", "café" -> "中文")),
      Seq(ArrayType(StringType, true)), strRows)

    val textRows = samples(text, 300, 9900L).map(Seq[Any](_)) :+ Seq(null)
    assertParity(WhitespaceTokens(in(0, StringType)), Seq(StringType), textRows)
    assertParity(ScrubPii(in(0, StringType)), Seq(StringType), textRows)

    // LshBands tolerates ragged input (planes extend on the fly) and
    // null elements (all-zero keys) — fuzz both
    val floatBox: Gen[java.lang.Float] = Gen.oneOf(
      Gen.const(null.asInstanceOf[java.lang.Float]),
      floatVal.map(java.lang.Float.valueOf))
    val lshArr: Gen[Seq[java.lang.Float]] =
      Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, floatBox))
    val lshRows = samples(lshArr, 300, 9950L).map(Seq(_)) ++
      Seq(Seq(null), Seq(Nil))
    assertParity(LshBands(in(0, ArrayType(FloatType, true)), dim = 4,
      numBands = 4, planesPerBand = 8), Seq(ArrayType(FloatType, true)), lshRows)
  }
}

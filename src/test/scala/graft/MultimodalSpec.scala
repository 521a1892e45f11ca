package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.Shim

import graft.ext.Multimodal
import graft.functions.{ImageFormat, ImageHeader, ImageHeaderInt}

/** Real-bytes certification of the image header parser + encoders: the
  * parser is pinned against fixture bytes of genuine files (not this
  * repo's own encoder), and the encoder is proven to emit files a real
  * third-party decoder (`javax.imageio`, pure JVM) accepts. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** A genuine 1×1 RGBA PNG (the ubiquitous transparent tracking pixel,
    * produced by a real encoder — not by this repo's code). */
  private val realPng: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")

  private def parse(b: Array[Byte]): (String, Integer, Integer, Integer, Integer) = (
    Option(ImageHeader.format(b)).map(_.toString).orNull,
    ImageHeader.field(b, ImageHeader.Width),
    ImageHeader.field(b, ImageHeader.Height),
    ImageHeader.field(b, ImageHeader.BitDepth),
    ImageHeader.field(b, ImageHeader.Channels))

  test("parser reads a genuine third-party PNG: 1x1 RGBA, depth 8") {
    assert(parse(realPng) === (("png", 1, 1, 8, 4)))
  }

  test("parser reads real BMPs incl. the top-down negative-height form") {
    assert(parse(Multimodal.encodeBmp(7, 3, bpp = 24)) === (("bmp", 7, 3, 24, 3)))
    assert(parse(Multimodal.encodeBmp(5, 9, bpp = 32)) === (("bmp", 5, 9, 32, 4)))
    assert(parse(Multimodal.encodeBmp(4, 4, bpp = 8)) === (("bmp", 4, 4, 8, 1)))
    // negative biHeight = top-down row order; pixel height is the magnitude
    assert(parse(Multimodal.encodeBmp(6, 2, bpp = 24, topDown = true)) ===
      (("bmp", 6, 2, 24, 3)))
  }

  test("malformed payloads classify as NULL, never throw") {
    val garbage = Seq(
      Array.empty[Byte],
      "just some text".getBytes("UTF-8"),
      realPng.take(20), // truncated mid-IHDR
      Array[Byte]('B', 'M', 1, 2, 3)) // BMP magic but no DIB header
    garbage.foreach { b =>
      assert(parse(b) === ((null, null, null, null, null)), b.toSeq.take(8))
    }
    // PNG signature with a corrupted IHDR tag: recognized as neither
    val corrupt = realPng.clone(); corrupt(12) = 'X'.toByte
    assert(parse(corrupt) === ((null, null, null, null, null)))
  }

  test("this repo's PNG encoder emits files a real decoder accepts") {
    // javax.imageio ships in every JDK — decode the encoder's output with
    // it and confirm dims + alpha; this is what makes the bytes REAL
    // images rather than merely parser-compatible
    for ((w, h, ct) <- Seq((3, 2, 6), (1, 5, 2), (4, 4, 0))) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodePng(w, h, ct)))
      assert(img != null, s"ImageIO rejected PNG ${w}x$h ct=$ct")
      assert(img.getWidth === w)
      assert(img.getHeight === h)
    }
    val bmp = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.encodeBmp(3, 2, bpp = 24)))
    assert(bmp != null && bmp.getWidth === 3 && bmp.getHeight === 2)
  }

  test("header expressions: codegen path equals the kernel, null-safe") {
    val df = Seq(
      (1L, realPng),
      (2L, Multimodal.encodeBmp(6, 2, bpp = 32)),
      (3L, "not an image".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    def hdr(f: Int) = Shim.column(ImageHeaderInt(Shim.expression(col("payload")), f))
    val rows = df.select(col("id"),
        Shim.column(ImageFormat(Shim.expression(col("payload")))).as("format"),
        hdr(ImageHeader.Width).as("w"), hdr(ImageHeader.Height).as("h"),
        hdr(ImageHeader.BitDepth).as("d"), hdr(ImageHeader.Channels).as("c"))
      .orderBy("id").collect()
    assert(rows(0).getString(1) === "png" && rows(0).getInt(2) === 1 &&
      rows(0).getInt(3) === 1 && rows(0).getInt(4) === 8 && rows(0).getInt(5) === 4)
    assert(rows(1).getString(1) === "bmp" && rows(1).getInt(2) === 6 &&
      rows(1).getInt(3) === 2 && rows(1).getInt(4) === 32 && rows(1).getInt(5) === 4)
    assert((1 to 5).forall(rows(2).isNullAt)) // garbage → all NULL
    assert((1 to 5).forall(rows(3).isNullAt)) // null payload → all NULL
  }

  test("realImageMeta round trip on the documents table") {
    val out = Multimodal.realImageMeta(spark,
      Tables.documents(spark, "/root/testdata/sf0.001")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("format") === (if (id % 2 == 0) "png" else "bmp"))
      assert(r.getAs[Int]("width") === (id % 64 + 1).toInt)
      assert(r.getAs[Int]("channels") > 0)
    }
  }

  test("wav parser: canonical file, chunk-walk past a LIST chunk, garbage -> NULL") {
    import graft.functions.WavHeader
    def f(b: Array[Byte], sel: Int): Integer = WavHeader.field(b, sel)
    val wav = Multimodal.encodeWav(channels = 2, sampleRate = 44100, bits = 16, nSamples = 10)
    assert(f(wav, WavHeader.Channels) === 2)
    assert(f(wav, WavHeader.SampleRate) === 44100)
    assert(f(wav, WavHeader.BitsPerSample) === 16)
    assert(f(wav, WavHeader.DataBytes) === 40) // 10 samples x 2 ch x 2 bytes
    // non-canonical layout: a LIST chunk between WAVE and fmt must be walked
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val shifted = wav.take(12) ++ list ++ wav.drop(12)
    // RIFF size field now stale, but the walker only trusts chunk bounds
    assert(f(shifted, WavHeader.SampleRate) === 44100)
    assert(f(shifted, WavHeader.DataBytes) === 40)
    // garbage and truncation classify as NULL, never throw
    assert(f("not audio at all".getBytes, WavHeader.Channels) === null)
    assert(f(wav.take(20), WavHeader.Channels) === null)
    assert(f(Array.empty[Byte], WavHeader.SampleRate) === null)
    // a WAV with no data chunk: fmt fields parse, data is NULL
    assert(f(wav.take(36), WavHeader.BitsPerSample) === 16)
    assert(f(wav.take(36), WavHeader.DataBytes) === null)
    // truncated mid-data: declared size has no backing payload -> NULL,
    // a consumer sizing a read buffer from it must never over-read
    assert(f(wav.take(50), WavHeader.DataBytes) === null)
    assert(f(wav.take(50), WavHeader.SampleRate) === 44100)
    // matching id with a garbage size: the POSITIONAL size check in
    // findChunk must reject the chunk itself (not lean on a caller's
    // downstream bounds check) — a data chunk declaring 0x7fffffff bytes
    // and an fmt chunk declaring more payload than the buffer holds both
    // classify as NULL for every field behind them
    val hugeData = wav.clone()
    hugeData(40) = 0xff.toByte; hugeData(41) = 0xff.toByte
    hugeData(42) = 0xff.toByte; hugeData(43) = 0x7f.toByte // data size @36+4
    assert(f(hugeData, WavHeader.DataBytes) === null)
    assert(f(hugeData, WavHeader.SampleRate) === 44100) // fmt precedes, still fine
    // the sharp case: declared fmt size 70 fits the 84-byte buffer as a
    // GLOBAL bound but not positionally (12+8+70 > 84) — the old check
    // (size <= b.length) accepted this chunk and read fields from a
    // payload the buffer can't back; the positional check rejects it
    val hugeFmt = wav.clone()
    hugeFmt(16) = 70; hugeFmt(17) = 0; hugeFmt(18) = 0; hugeFmt(19) = 0
    assert(f(hugeFmt, WavHeader.Channels) === null)
    assert(f(hugeFmt, WavHeader.SampleRate) === null)
    assert(f(hugeFmt, WavHeader.DataBytes) === null) // walk dies at the bad fmt
  }

  test("header parsers never throw on arbitrary bytes (seeded fuzz)") {
    import graft.functions.WavHeader
    val rnd = new scala.util.Random(7)
    val probes: Seq[Array[Byte]] =
      (0 until 200).map { _ =>
        val b = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(b); b
      } ++
      // structured-prefix mutants: valid signatures with garbage after
      (0 until 50).map { _ =>
        val tail = new Array[Byte](rnd.nextInt(48)); rnd.nextBytes(tail)
        "RIFF".getBytes ++ tail
      } ++
      (0 until 50).map { _ =>
        val wav = Multimodal.encodeWav(1, 8000, 8, 4)
        val i = rnd.nextInt(wav.length)
        wav.updated(i, rnd.nextInt(256).toByte)
      } ++
      // image-side mutants: byte-flipped REAL png/bmp (past the signature,
      // into the chunk/DIB parse paths) and valid-signature garbage tails
      (0 until 50).map { _ =>
        val png = realPng
        png.updated(rnd.nextInt(png.length), rnd.nextInt(256).toByte)
      } ++
      (0 until 50).map { _ =>
        val bmp = Multimodal.encodeBmp(3, 2, 24)
        bmp.updated(rnd.nextInt(bmp.length), rnd.nextInt(256).toByte)
      } ++
      (0 until 25).map { _ =>
        val tail = new Array[Byte](rnd.nextInt(30)); rnd.nextBytes(tail)
        realPng.take(8) ++ tail // PNG signature, mangled IHDR region
      } ++
      (0 until 25).map { _ =>
        val tail = new Array[Byte](rnd.nextInt(40)); rnd.nextBytes(tail)
        "BM".getBytes ++ tail
      }
    probes.foreach { b =>
      (WavHeader.Channels to WavHeader.DataBytes).foreach(f => WavHeader.field(b, f))
      ImageHeader.format(b)
      (ImageHeader.Width to ImageHeader.Channels).foreach(f => ImageHeader.field(b, f))
    }
  }

  test("pattern PNG decodes pixel-exact through the JDK codec") {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.encodePngPattern(5, 4)))
    assert(img.getWidth === 5 && img.getHeight === 4)
    for (y <- 0 until 4; x <- 0 until 5)
      assert(img.getRaster.getSample(x, y, 0) === (x + y) % 256,
        s"pixel ($x,$y)")
  }

  test("decodePixels: real raster decode matches the pattern's closed form") {
    val out = Multimodal.decodePixels(spark,
      Tables.documents(spark, "/root/testdata/sf0.001")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val expect = (for (y <- 0 until h; x <- 0 until w) yield (x + y) % 256).map(_.toLong).sum
      assert(r.getAs[Long]("pixel_sum") === expect, s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Double]("pixel_mean") === expect.toDouble / (w.toLong * h))
    }
  }

  test("conv features: real decode + kernel bank matches a brute-force reference") {
    val out = Multimodal.decodeConvFeatures(spark,
      Tables.documents(spark, "/root/testdata/sf0.001")).collect()
    assert(out.nonEmpty)
    val kernels = Seq(
      ("f_box", Array(1, 1, 1, 1, 1, 1, 1, 1, 1)),
      ("f_sobel_x", Array(-1, 0, 1, -2, 0, 2, -1, 0, 1)),
      ("f_sobel_y", Array(-1, -2, -1, 0, 0, 0, 1, 2, 1)),
      ("f_laplace", Array(0, 1, 0, 1, -4, 1, 0, 1, 0)))
    var sawInterior = false
    var sawEmpty = false
    var sawSobelSplit = false
    out.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      def v(x: Int, y: Int): Long = (x + 2 * y) % 256
      kernels.foreach { case (name, taps) =>
        val expect = (for {
          y <- 1 until h - 1; x <- 1 until w - 1; t <- 0 until 9
        } yield taps(t) * v(x + t % 3 - 1, y + t / 3 - 1)).sum
        assert(r.getAs[Long](name) === expect, s"$name doc ${r.getAs[Long]("doc_id")}")
      }
      if (w >= 3 && h >= 3) sawInterior = true
      if (w < 3 || h < 3) sawEmpty = true
      // the asymmetric pattern must split the two Sobel directions
      if (r.getAs[Long]("f_sobel_x") != r.getAs[Long]("f_sobel_y")) sawSobelSplit = true
    }
    // every branch must actually have executed on this corpus
    assert(sawInterior && sawEmpty && sawSobelSplit,
      s"vacuous coverage: interior=$sawInterior empty=$sawEmpty split=$sawSobelSplit")
  }

  test("realAudioMeta round trip on the documents table") {
    val out = Multimodal.realAudioMeta(spark,
      Tables.documents(spark, "/root/testdata/sf0.001")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("channels") === (id % 2 + 1).toInt)
      assert(r.getAs[Int]("sample_rate") === Array(8000, 16000, 44100)((id % 3).toInt))
      assert(r.getAs[Int]("n_samples") ===
        r.getAs[Int]("data_bytes") / (r.getAs[Int]("channels") * r.getAs[Int]("bits_per_sample") / 8))
    }
  }

  test("stored-binary decode: media parquet scan feeds the decoder, stats equal the direct path") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val cacheDir = java.nio.file.Files.createTempDirectory("media-cache").toString
    val media = Multimodal.storedMedia(spark, docs,
      cacheDir = Some(cacheDir), datasetTag = "spec-corpus-1")
    // the media column is BINARY and the frame comes off a PARQUET SCAN —
    // payload bytes genuinely cross the columnar reader
    assert(media.schema("media").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val scans = media.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, media.queryExecution.executedPlan.treeString.take(800))
    assert(scans.head.relation.fileFormat.toString.toLowerCase.contains("parquet"))
    // stored decode == direct generator-backed decode, row for row
    val stored = Multimodal.decodePixelsStored(spark, docs,
        cacheDir = Some(cacheDir), datasetTag = "spec-corpus-1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).sorted
    val direct = Multimodal.decodePixels(spark, docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).sorted
    assert(stored.nonEmpty)
    assert(stored === direct)
    // second construction is a cache HIT (no regeneration): the memo dir
    // holds exactly one committed media table
    Multimodal.storedMedia(spark, docs, Some(cacheDir), "spec-corpus-1").count()
    val committed = new java.io.File(cacheDir).listFiles.filter(!_.getName.contains(".tmp_"))
    assert(committed.length === 1)
  }
}

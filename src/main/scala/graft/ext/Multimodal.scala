package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal asset: opaque binary payload + typed metadata. */
final case class MediaRecord(
    doc_id: Long,
    media_type: String,
    payload: Array[Byte])

/** Extracted features for one asset (decode stubbed — see [[Multimodal]]). */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Int,
    feature: Array[Float])

/**
 * Multimodal-column handling for a training-data pipeline: image/audio/video
 * travel as opaque `binary` columns with typed metadata; decode/feature
 * extraction runs per-partition so any native decoder is loaded once per
 * task, not per row.
 *
 * Two layers, honestly labeled:
 *  - REAL: container handling AND pixel decode. [[realImageMeta]] parses
 *    genuine PNG IHDR / BMP headers out of the binary column via codegen'd
 *    expressions (`graft.functions.ImageHeader`); [[realAudioMeta]] walks
 *    RIFF/WAV chunks; [[encodePng]]/[[encodeBmp]]/[[encodeWav]] emit
 *    spec-valid files; and [[decodePixels]] decodes ACTUAL PNG rasters
 *    through `javax.imageio` (the JDK's codec — true inflate + filter
 *    reconstruction), certified against the pattern raster's closed form.
 *  - STUB: the generic learned-feature extractor. [[decodeStub]] derives a
 *    deterministic fake embedding from payload bytes (no ML model in this
 *    container). The Spark-side plumbing — binary schema, partition-wise
 *    batch processing, typed Dataset boundaries — is real and is what
 *    matters at 100 TB: payloads never pass through a Python serialization
 *    boundary, partition sizing bounds memory, and metadata columns stay
 *    columnar for pruning.
 */
object Multimodal {

  /** Synthetic asset dimensions derived from doc columns — the ONE
    * definition shared by the image-meta and pixel-decode passes (each
    * oracle mirrors it; a drift between Scala copies would be invisible
    * to compare because each copy is checked against its own mirror). */
  private def assetDims(id: Long, nChars: Int): (Int, Int) =
    ((id % 64).toInt + 1, (nChars % 48) + 1)

  /** Wrap the documents table as a media table: payload = UTF-8 bytes of
    * `text` standing in for an encoded asset. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      col("text").cast("binary").as("payload"))

  /** Columnar metadata over binary payloads (no decode): byte size and a
    * content digest — the dedup/integrity layer of an asset pipeline. */
  def meta(docs: DataFrame): DataFrame =
    mediaFromDocuments(docs).select(
      col("doc_id"),
      col("media_type"),
      length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"))

  /**
   * Frame sampling over opaque binary payloads: split into fixed-size
   * byte frames, keep every `stride`-th, and emit per-frame metadata + a
   * content digest — the "sample k frames from each video, fingerprint
   * them" layout pass of a multimodal pipeline, WITHOUT any decode: frame
   * slicing is `substring` on the binary column (codegen'd, columnar), so
   * this runs at full scan speed and the digests feed straight into the
   * dedup machinery. A real video pipeline swaps byte-strided frames for
   * container-aware offsets; the dataflow (explode bounded index list →
   * slice → digest) is unchanged.
   */
  def frameSample(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    media
      .withColumn("n_frames",
        ceil(length(col("payload")) / lit(frameBytes.toDouble)).cast("int"))
      .select(col("doc_id"), col("media_type"),
        explode(expr(
          s"CASE WHEN n_frames <= 0 THEN array() " +
          s"ELSE filter(sequence(0, n_frames - 1), i -> i % $stride = 0) END")).as("frame_idx"),
        col("payload"))
      .select(col("doc_id"), col("media_type"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"))
      .select(col("doc_id"), col("media_type"), col("frame_idx"),
        length(col("frame")).as("frame_len"),
        md5(col("frame")).as("frame_md5"))

  /**
   * STUB resize: a real implementation decodes, rescales, and re-encodes
   * the asset; the container ships no codecs, so the stand-in byte-strides
   * the payload down to at most `targetBytes` (every ceil(len/target)-th
   * byte) and records original/resized sizes — exercising exactly the
   * schema and columnar dataflow (binary in, smaller binary + metadata
   * out, no shuffle) a real thumbnailer would use.
   *
   * Per-row cost bound: the kept indices are generated DIRECTLY as
   * j·stride for j in [0, (n_bytes−1) DIV stride] — at most ~`targetBytes`
   * elements — identical to filtering i % stride = 0 out of [0, n_bytes)
   * but without materializing the n_bytes-element index array per row.
   * (The original filter-the-full-range form allocated O(payload) boxed
   * ints per row; harmless at 4 concurrent scan tasks, it went
   * allocation-bound the moment the r16 row-group fix raised scan
   * parallelism to 24 — measured 3× slower at sf10 while every sibling
   * kernel got faster. The oracle is value-identical either way.) The
   * byte-wise `concat` fold stays O(kept²) in output size, capped by
   * `targetBytes`. A real implementation replaces the whole expression
   * with a per-partition codec call ([[decodeStub]]'s `mapPartitions`
   * shape), which is why this stays a clearly-marked STUB rather than a
   * chunked rewrite.
   */
  def resizeStub(media: DataFrame, targetBytes: Int = 256): DataFrame =
    media
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("stride", greatest(lit(1), ceil(col("n_bytes") / lit(targetBytes.toDouble)).cast("int")))
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        // byte-level fold: substring+concat stay BINARY end-to-end (a
        // string round-trip would mangle any non-UTF-8 byte)
        expr("""CASE WHEN n_bytes = 0 THEN payload ELSE
               |  aggregate(sequence(0, (n_bytes - 1) DIV stride),
               |    X'', (acc, j) -> concat(acc, substring(payload, j * stride + 1, 1))) END""".stripMargin)
          .as("resized"))
      .withColumn("resized_bytes", length(col("resized")))

  /** Modulus for the decode-stub rolling hash: a prime below 2^31, so the
    * recurrence `acc = (acc*31 + b) mod M` never leaves 64-bit range
    * (M*31 + 255 < 2^31) and any engine with BIGINT arithmetic — including
    * the DuckDB oracle — can mirror it bit-for-bit. */
  val DecodeHashMod: Long = 1000003L

  /**
   * STUB media decoder: a real implementation would decode the image/audio
   * payload (e.g. via a JNI codec) and emit a model feature vector. The
   * deterministic stand-in hashes each `dim`-strided byte lane of the
   * payload into a bounded `dim`-length float vector via a non-wrapping
   * modular recurrence (see [[DecodeHashMod]]), so tests exercise the exact
   * partition-wise dataflow and schema a real decoder would use AND an
   * external SQL oracle can reproduce the values exactly.
   */
  def decodeStub(spark: SparkSession, media: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition setup would happen here (decoder init, model load)
      it.map { rec =>
        val bytes = rec.payload
        val feature = Array.tabulate(dim) { d =>
          var acc = 0L
          var i = d
          while (i < bytes.length) {
            acc = (acc * 31 + (bytes(i) & 0xffL)) % DecodeHashMod
            i += dim
          }
          ((acc % 1000L).toFloat) / 1000.0f
        }
        MediaFeatures(rec.doc_id, rec.media_type, bytes.length, feature)
      }
    }
  }

  // -------------------------------------------------------------------------
  // REAL image handling (no stub): spec-valid PNG/BMP encoders and the
  // header-parse metadata pass over genuine bytes.
  // -------------------------------------------------------------------------

  private def pngChannelCount(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    case other => throw new IllegalArgumentException(s"bad PNG color type $other")
  }

  /** REAL, spec-valid PNG bytes (decodable by any PNG reader, including
    * `javax.imageio` — MultimodalSpec proves that round trip): signature,
    * IHDR with correct CRC32, one deflate-compressed all-zero raster IDAT
    * (each row = filter byte 0 + width×channels zero samples at bit depth
    * 8), IEND. Used as the genuine-bytes source for the header-parse
    * oracle query and as a test fixture generator. */
  def encodePng(width: Int, height: Int, colorType: Int = 6): Array[Byte] = {
    // validate BEFORE the raster allocation: a negative or overflowing
    // size must fail as "bad dims", not NegativeArraySizeException
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    encodePngRaster(width, height, colorType,
      new Array[Byte](height * (1 + width * pngChannelCount(colorType))))
  }

  /** REAL PNG carrying the deterministic grayscale test pattern
    * `pixel(x,y) = (x + yCoef·y) mod 256` — a raster a pixel-decode pass
    * can be certified against in closed form (the zero raster would let a
    * broken decoder pass trivially). `yCoef = 2` breaks the x/y symmetry
    * so direction-sensitive checks (Sobel-x vs Sobel-y) certify
    * independently; the default 1 is the q_multimodal_pixels pattern. */
  def encodePngPattern(width: Int, height: Int, yCoef: Int = 1): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val raw = new Array[Byte](height * (1 + width))
    var i = 0
    var y = 0
    while (y < height) {
      raw(i) = 0 // per-row filter byte: None
      i += 1
      var x = 0
      while (x < width) { raw(i) = ((x + yCoef * y) % 256).toByte; i += 1; x += 1 }
      y += 1
    }
    encodePngRaster(width, height, 0, raw)
  }

  private def encodePngRaster(width: Int, height: Int, colorType: Int,
                              raw: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length.toLong))
      val tagBytes = tag.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tagBytes); crc.update(data)
      out.write(tagBytes); out.write(data); out.write(be32(crc.getValue))
    }
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    chunk("IHDR", be32(width.toLong) ++ be32(height.toLong) ++
      Array(8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte))
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](8192)
    val idat = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** REAL, spec-valid BMP bytes (BITMAPINFOHEADER): file header, 40-byte
    * DIB header, a zeroed 2^bpp palette for indexed depths, and the zeroed
    * 4-byte-row-aligned pixel array. `topDown = true` writes the spec's
    * negative-height form. */
  def encodeBmp(width: Int, height: Int, bpp: Int = 24,
                topDown: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(Set(1, 4, 8, 16, 24, 32).contains(bpp), s"bad bpp $bpp")
    val paletteBytes = if (bpp <= 8) (1 << bpp) * 4 else 0
    val rowBytes = ((width * bpp + 31) / 32) * 4
    val pixelBytes = rowBytes * height
    val offset = 14 + 40 + paletteBytes
    val size = offset + pixelBytes
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putShort(0).putShort(0).putInt(offset)
    b.putInt(40).putInt(width).putInt(if (topDown) -height else height)
      .putShort(1).putShort(bpp.toShort)
      .putInt(0).putInt(pixelBytes).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // palette + pixel array stay zeroed (allocate() zero-fills)
    b.array()
  }

  /** REAL, spec-valid WAV bytes: RIFF header, canonical 16-byte PCM
    * `fmt ` chunk, zero-filled `data` chunk of
    * nSamples × channels × bits/8 bytes — playable by any WAV reader. */
  def encodeWav(channels: Int, sampleRate: Int, bits: Int,
                nSamples: Int): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && (bits == 8 || bits == 16) && nSamples >= 0,
      s"bad wav params: $channels ch, $sampleRate Hz, $bits bits, $nSamples samples")
    val dataBytes = nSamples * channels * (bits / 8)
    val b = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort) // PCM
      .putInt(sampleRate).putInt(sampleRate * channels * (bits / 8))
      .putShort((channels * (bits / 8)).toShort).putShort(bits.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    b.array() // samples stay zeroed (silence)
  }

  /**
   * REAL pixel decode — the layer that used to be the honestly-labeled
   * stub: each document becomes a genuine PNG carrying the deterministic
   * test pattern ([[encodePngPattern]]), and a per-partition pass decodes
   * the ACTUAL raster through `javax.imageio` — the JDK's PNG codec, a
   * true third-party inflate + filter reconstruction, not this repo's
   * encoder logic — then reduces it to pixel statistics. The oracle
   * recomputes the same statistics from the pattern's CLOSED FORM
   * ((x+y) mod 256 over the grid), so a decoder that mis-inflates,
   * mis-unfilters, or mis-indexes any pixel hash-mismatches.
   *
   * Scale shape: generation and decode are one narrow mapPartitions pass
   * (decoder state per partition, never per row; payloads never cross a
   * serialization boundary to another runtime); zero shuffles.
   */
  /** Shared decode scaffold for the real-pixel passes: per doc, generate
    * the pattern asset and decode it through `javax.imageio`, handing the
    * caller (id, width, height, raster) to reduce. The disk cache is
    * disabled once per task — the default wraps every read in a
    * temp-FILE-backed stream, per-row disk I/O in a pass whose point is
    * staying narrow and in-memory. */
  private def decodedRasters[T](docs: DataFrame, yCoef: Int)(
      reduce: (Long, Int, Int, java.awt.image.Raster) => T)(
      implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars").cast("int").as("n_chars"))
      .as[(Long, Int)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, nChars) =>
          val (w0, h0) = assetDims(id, nChars)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(encodePngPattern(w0, h0, yCoef)))
          reduce(id, img.getWidth, img.getHeight, img.getRaster)
        }
      }
  }

  def decodePixels(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodedRasters(docs, yCoef = 1) { (id, w, h, raster) =>
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      (id, w, h, sum, sum.toDouble / (w.toLong * h))
    }.toDF("doc_id", "width", "height", "pixel_sum", "pixel_mean")
  }

  /**
   * MATERIALIZED media table: (doc_id, width, height, media BINARY) with
   * the real PNG bytes as a stored binary column plus typed metadata —
   * the "opaque binary + typed metadata" media-lake layout. With
   * `cacheDir` set the table persists via [[FrameCache]] (atomic-move
   * parquet memo, keyed on the corpus snapshot fingerprint) and the
   * returned frame is a genuine PARQUET BINARY-COLUMN SCAN — payload
   * bytes cross the columnar reader exactly as they would from a
   * crawler-written media lake, which is the path [[decodePixelsStored]]
   * exists to certify. Generation is one narrow mapPartitions encode
   * pass; the memo write is eager on first construction (see
   * [[FrameCache]]) and every later query against the same snapshot is
   * scan-only.
   */
  def storedMedia(spark: SparkSession, docs: DataFrame,
                  cacheDir: Option[String] = None,
                  datasetTag: String = ""): DataFrame = {
    import spark.implicits._
    FrameCache.cached(spark, cacheDir, "media_png_v1", datasetTag) {
      docs.select(col("doc_id"), col("n_chars").cast("int").as("n_chars"))
        .as[(Long, Int)]
        .mapPartitions { it =>
          it.map { case (id, nChars) =>
            val (w, h) = assetDims(id, nChars)
            (id, w, h, encodePngPattern(w, h, yCoef = 1))
          }
        }.toDF("doc_id", "width", "height", "media")
    }
  }

  /**
   * [[decodePixels]] reading from a STORED binary column: the PNGs come
   * out of [[storedMedia]]'s parquet scan (real bytes through the
   * columnar reader, with the memory behavior of a true media-lake scan —
   * one payload per row, decoder state per partition), not from an
   * in-pass generator. Same decoder, same statistics, same closed-form
   * oracle as q_multimodal_pixels — so a corruption anywhere in the
   * write→scan→decode path hash-mismatches. With `cacheDir = None` (or
   * the FrameCache kill switch) the media frame is computed in-line and
   * the query degrades to the generator-backed path; the REGISTERED form
   * passes a cacheDir, so the correctness gate exercises the stored scan.
   */
  def decodePixelsStored(spark: SparkSession, docs: DataFrame,
                         cacheDir: Option[String] = None,
                         datasetTag: String = ""): DataFrame = {
    import spark.implicits._
    storedMedia(spark, docs, cacheDir, datasetTag)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          val raster = img.getRaster
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          (id, w, h, sum, sum.toDouble / (w.toLong * h))
        }
      }.toDF("doc_id", "width", "height", "pixel_sum", "pixel_mean")
  }

  /** Fixed 3×3 kernels for [[decodeConvFeatures]] — box, Sobel-x, Sobel-y,
    * Laplacian. Integer taps ⇒ exact arithmetic, so the oracle can state
    * the expected response in closed form. Row-major (j = row offset). */
  private val ConvKernels: Array[Array[Int]] = Array(
    Array(1, 1, 1, 1, 1, 1, 1, 1, 1),     // box
    Array(-1, 0, 1, -2, 0, 2, -1, 0, 1),  // sobel-x
    Array(-1, -2, -1, 0, 0, 0, 1, 2, 1),  // sobel-y
    Array(0, 1, 0, 1, -4, 1, 0, 1, 0))    // laplacian

  /**
   * REAL feature extraction over REAL decoded pixels — closes the last
   * stubbed layer: the raster comes out of `javax.imageio` (true PNG
   * decode, as in [[decodePixels]]) and a fixed-weight 3×3 convolution
   * bank (box / Sobel-x / Sobel-y / Laplacian, integer taps, valid region
   * only) reduces it to one global response sum per kernel — a genuine,
   * deterministic image descriptor with no model weights to ship. The
   * oracle restates each response in closed form over the pattern raster,
   * so a decoder OR extractor that mis-reads any pixel hash-mismatches.
   *
   * Scale shape: identical to [[decodePixels]] — one narrow mapPartitions
   * pass, decoder configured once per task, zero shuffles.
   */
  def decodeConvFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodedRasters(docs, yCoef = 2) { (id, w, h, raster) =>
      val sums = new Array[Long](ConvKernels.length)
      val window = new Array[Int](9)
      var y = 1
      while (y < h - 1) {
        var x = 1
        while (x < w - 1) {
          // read the 3×3 window ONCE, apply all four kernels to it —
          // getSample is a virtual per-sample accessor, so this cuts the
          // decode-path reads 4× vs per-kernel sampling
          var t = 0
          while (t < 9) {
            window(t) = raster.getSample(x + t % 3 - 1, y + t / 3 - 1, 0)
            t += 1
          }
          var k = 0
          while (k < ConvKernels.length) {
            val taps = ConvKernels(k)
            var acc = 0L
            t = 0
            while (t < 9) { acc += taps(t) * window(t); t += 1 }
            sums(k) += acc
            k += 1
          }
          x += 1
        }
        y += 1
      }
      (id, w, h, sums(0), sums(1), sums(2), sums(3))
    }.toDF("doc_id", "width", "height", "f_box", "f_sobel_x", "f_sobel_y", "f_laplace")
  }

  /**
   * Header-parse metadata over REAL audio bytes — the audio leg of the
   * non-stub multimodal surface (q_multimodal_audio_meta): each document
   * deterministically becomes a genuine PCM WAV (layout derived from
   * doc_id/n_chars) and the chunk-walking [[graft.functions.WavHeader]]
   * expressions parse channels/rate/depth/payload back OUT at scan speed.
   * The oracle recomputes the same fields from the doc columns directly,
   * so encoder and parser certify each other; `n_samples` is derived IN
   * SQL from three parsed fields, exercising the arithmetic path a real
   * asset inventory runs. Same scale shape as [[realImageMeta]]: one
   * scan, zero shuffles.
   */
  def realAudioMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graftshim.Shim
    import graft.functions.{WavHeader, WavHeaderInt}
    val assets = docs
      .select(col("doc_id"), col("n_chars").cast("int").as("n_chars"))
      .as[(Long, Int)]
      .map { case (id, nChars) =>
        (id, encodeWav(
          channels = (id % 2).toInt + 1,
          sampleRate = Array(8000, 16000, 44100)((id % 3).toInt),
          bits = Array(8, 16)(((id / 2) % 2).toInt),
          nSamples = (nChars % 200) + 1))
      }
      .toDF("doc_id", "payload")
    def hdr(f: Int) = Shim.column(WavHeaderInt(Shim.expression(col("payload")), f))
    assets.select(
      col("doc_id"),
      hdr(WavHeader.Channels).as("channels"),
      hdr(WavHeader.SampleRate).as("sample_rate"),
      hdr(WavHeader.BitsPerSample).as("bits_per_sample"),
      hdr(WavHeader.DataBytes).as("data_bytes"))
      .withColumn("n_samples",
        (col("data_bytes") / (col("channels") * (col("bits_per_sample") / 8))).cast("int"))
  }

  /**
   * Header-parse metadata over REAL image bytes — the non-stub multimodal
   * pass (q_multimodal_real_meta): each document deterministically becomes
   * a genuine PNG or BMP asset (dims and pixel format derived from
   * doc_id/n_chars), and the [[graft.functions.ImageHeader]] expressions
   * parse format/width/height/bit-depth/channels back OUT of the bytes at
   * scan speed (codegen'd, no shuffle). The oracle computes the same
   * fields from the same doc columns directly, so a bug in EITHER the
   * encoder or the parser breaks the round trip — the query certifies
   * them against each other, and MultimodalSpec pins the parser against
   * fixture bytes from genuine third-party files.
   *
   * Scale shape: generation is a map (stands in for reading an asset
   * column); parsing is four codegen'd expressions over the binary column
   * — one scan, zero shuffles, metadata prunes to the header bytes.
   */
  def realImageMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graftshim.Shim
    import graft.functions.{ImageFormat, ImageHeaderInt, ImageHeader}
    val assets = docs
      .select(col("doc_id"), col("n_chars").cast("int").as("n_chars"))
      .as[(Long, Int)]
      .map { case (id, nChars) =>
        val (w, h) = assetDims(id, nChars)
        val payload =
          if (id % 2 == 0) encodePng(w, h, Array(6, 2, 0, 4)(((id / 2) % 4).toInt))
          else encodeBmp(w, h, Array(24, 32, 8)(((id / 2) % 3).toInt))
        (id, payload)
      }
      .toDF("doc_id", "payload")
    def hdr(f: Int) = Shim.column(ImageHeaderInt(Shim.expression(col("payload")), f))
    assets.select(
      col("doc_id"),
      Shim.column(ImageFormat(Shim.expression(col("payload")))).as("format"),
      hdr(ImageHeader.Width).as("width"),
      hdr(ImageHeader.Height).as("height"),
      hdr(ImageHeader.BitDepth).as("bit_depth"),
      hdr(ImageHeader.Channels).as("channels"))
  }
}

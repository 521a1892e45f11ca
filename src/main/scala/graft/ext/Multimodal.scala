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
 * The actual media decode is a clearly-marked STUB (this container ships no
 * image/audio codecs): [[decodeStub]] derives a deterministic fake feature
 * vector from the payload bytes. The Spark-side plumbing — binary schema,
 * partition-wise batch processing, typed Dataset boundaries — is real and
 * is what matters at 100 TB: payloads never pass through a Python
 * serialization boundary, partition sizing bounds memory, and metadata
 * columns stay columnar for pruning.
 */
object Multimodal {

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
   * Per-row cost bound: the index list materializes `n_bytes` elements and
   * the byte-wise `concat` fold is O(kept²) in output size (kept ≤
   * ~`targetBytes`, so the fold is capped, but the index array is not) —
   * fine for test-scale payloads, NOT for multi-MB assets. A real
   * implementation replaces the whole expression with a per-partition
   * codec call ([[decodeStub]]'s `mapPartitions` shape), which is why this
   * stays a clearly-marked STUB rather than a chunked rewrite.
   */
  def resizeStub(media: DataFrame, targetBytes: Int = 256): DataFrame =
    media
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("stride", greatest(lit(1), ceil(col("n_bytes") / lit(targetBytes.toDouble)).cast("int")))
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        // byte-level fold: substring+concat stay BINARY end-to-end (a
        // string round-trip would mangle any non-UTF-8 byte)
        expr("""CASE WHEN n_bytes = 0 THEN payload ELSE
               |  aggregate(filter(sequence(0, n_bytes - 1), i -> i % stride = 0),
               |    X'', (acc, i) -> concat(acc, substring(payload, i + 1, 1))) END""".stripMargin)
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
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Real audio-container parsing over opaque `binary` columns — the audio
 * sibling of [[ImageHeader]] (sample decode stays out of scope; the
 * metadata pass is what an asset-inventory scan runs). One format in pure
 * JVM byte arithmetic, no codec library:
 *
 *  - WAV/RIFF: ASCII `RIFF` at 0, `WAVE` at 8, then a sequence of
 *    (4-byte ASCII id, LE uint32 size) chunks from offset 12. The parser
 *    WALKS the chunk list (word-aligned sizes per the spec) rather than
 *    assuming the canonical 44-byte layout, so files with LIST/INFO or
 *    extended-fmt chunks still parse: `fmt ` yields channels (LE16 @+2),
 *    sample rate (LE32 @+4), bits per sample (LE16 @+14); `data` yields
 *    its payload size.
 *
 * Malformed/foreign payloads yield NULL (never an exception) — same
 * garbage-tolerance contract as the image parser.
 */
object WavHeader {

  // field selectors for WavHeaderInt
  val Channels = 0
  val SampleRate = 1
  val BitsPerSample = 2
  val DataBytes = 3

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24))

  private def id4(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && id4(b, 0, "RIFF") && id4(b, 8, "WAVE")

  /** Offset of the named chunk's PAYLOAD, or -1. Bounded walk (a garbage
    * size field cannot loop forever), sizes word-aligned per the spec.
    * The size sanity check runs BEFORE the id match and is POSITIONAL
    * (`pos + 8 + size` must fit the buffer), so every returned offset
    * names a chunk whose entire declared payload is present — a matching
    * chunk whose declared size runs past the buffer is truncation/garbage
    * and yields -1 here, instead of leaning on each caller's downstream
    * bounds checks to catch the over-read. */
  private def findChunk(b: Array[Byte], name: String): Int = {
    var pos = 12
    var steps = 0
    while (pos + 8 <= b.length && steps < 64) {
      val size = le32(b, pos + 4)
      if (size < 0 || pos + 8 + size > b.length) return -1
      if (id4(b, pos, name)) return pos + 8
      pos += 8 + size.toInt + (size.toInt & 1)
      steps += 1
    }
    -1
  }

  /** Selected field as a boxed Integer, null when absent/unparseable. */
  def field(b: Array[Byte], f: Int): Integer = {
    if (!isWav(b)) return null
    if (f == DataBytes) {
      val d = findChunk(b, "data")
      if (d < 0) null
      else {
        val size = le32(b, d - 4)
        // a declared size the payload can't back is truncation → NULL
        // (same contract as the fmt fields); a consumer sizing a read
        // buffer from this value must never over-read
        if (size > Int.MaxValue || d + size > b.length) null
        else Integer.valueOf(size.toInt)
      }
    } else {
      val fmt = findChunk(b, "fmt ")
      if (fmt < 0 || fmt + 16 > b.length) null
      else f match {
        case Channels =>
          val c = le16(b, fmt + 2); if (c == 0) null else Integer.valueOf(c)
        case SampleRate =>
          val r = le32(b, fmt + 4)
          if (r == 0 || r > Int.MaxValue) null else Integer.valueOf(r.toInt)
        case BitsPerSample =>
          val bits = le16(b, fmt + 14); if (bits == 0) null else Integer.valueOf(bits)
        case _ => null
      }
    }
  }
}

/** One integer WAV header field (see [[WavHeader]] selectors): channels,
  * sample rate, bits per sample, or data-chunk bytes. NULL when absent. */
case class WavHeaderInt(child: Expression, fieldSel: Int) extends UnaryExpression {

  require(fieldSel >= WavHeader.Channels && fieldSel <= WavHeader.DataBytes,
    s"unknown wav header field selector $fieldSel")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft wav header expects BINARY, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WavHeader.field(input.asInstanceOf[Array[Byte]], fieldSel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = WavHeader.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"""java.lang.Integer r = $kernel.field($a, $fieldSel);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.intValue(); }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

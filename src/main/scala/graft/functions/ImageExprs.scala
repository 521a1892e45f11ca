package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Real image-header parsing over opaque `binary` columns — the genuine
 * half of the multimodal surface (the pixel decode stays a stub; see
 * `graft.ext.Multimodal`). Two container formats are parsed in pure JVM
 * byte arithmetic, no codec library:
 *
 *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR chunk
 *    (must be first per the spec): 4-byte big-endian length (= 13),
 *    ASCII `IHDR`, then width/height as big-endian uint32, bit depth and
 *    color type bytes. Channels derive from color type
 *    (0 gray→1, 2 RGB→3, 3 palette→1, 4 gray+alpha→2, 6 RGBA→4).
 *  - BMP (BITMAPINFOHEADER and later): ASCII `BM`, 4-byte little-endian
 *    DIB header size ≥ 40 at offset 14, signed LE width/height at 18/22
 *    (negative height = top-down rows → reported as |height|), LE uint16
 *    bits-per-pixel at 28. Channels derive from bpp
 *    (1/4/8 palette→1, 16/24 RGB→3, 32 RGBA→4).
 *
 * Malformed/foreign payloads yield NULL (never an exception): a 100 TB
 * asset scan always contains garbage rows, and a metadata pass must
 * classify them, not die. Expressions participate in whole-stage codegen
 * via the shared [[ImageHeader]] kernel (same compiled code on the
 * interpreted path — bit-identical).
 */
object ImageHeader {

  private val PngSig: Array[Int] = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  // field selectors for ImageHeaderInt
  val Width = 0
  val Height = 1
  val BitDepth = 2
  val Channels = 3

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3))

  private def le32(b: Array[Byte], i: Int): Int =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24))

  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  /** PNG with a well-formed leading IHDR chunk (needs bytes 0..25). */
  def isPng(b: Array[Byte]): Boolean =
    b.length >= 26 &&
      (0 until 8).forall(i => u8(b, i) == PngSig(i)) &&
      be32(b, 8) == 13L &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'

  /** BMP with a BITMAPINFOHEADER-or-later DIB header (needs bytes 0..29). */
  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 30 && b(0) == 'B' && b(1) == 'M' && le32(b, 14) >= 40

  /** Container format, or null when neither signature matches. */
  def format(b: Array[Byte]): UTF8String =
    if (isPng(b)) UTF8String.fromString("png")
    else if (isBmp(b)) UTF8String.fromString("bmp")
    else null

  private def pngChannels(colorType: Int): Integer = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // truecolor
    case 3 => 1 // palette index
    case 4 => 2 // gray + alpha
    case 6 => 4 // truecolor + alpha
    case _ => null
  }

  private def bmpChannels(bpp: Int): Integer = bpp match {
    case 1 | 4 | 8 => 1 // palette index
    case 16 | 24 => 3
    case 32 => 4
    case _ => null
  }

  /** Selected header field as a boxed Integer, null when unparseable.
    * PNG dimensions are spec-limited to 2^31-1, so a sign-bit overflow on
    * the uint32 read marks the payload malformed (null), never negative. */
  def field(b: Array[Byte], f: Int): Integer =
    if (isPng(b)) {
      f match {
        case Width =>
          val w = be32(b, 16); if (w > Int.MaxValue || w == 0) null else Integer.valueOf(w.toInt)
        case Height =>
          val h = be32(b, 20); if (h > Int.MaxValue || h == 0) null else Integer.valueOf(h.toInt)
        case BitDepth => Integer.valueOf(u8(b, 24))
        case Channels => pngChannels(u8(b, 25))
        case _ => null
      }
    } else if (isBmp(b)) {
      f match {
        case Width =>
          val w = le32(b, 18); if (w <= 0) null else Integer.valueOf(w)
        case Height =>
          // negative = top-down row order; magnitude is the pixel height
          val h = le32(b, 22)
          if (h == 0 || h == Int.MinValue) null else Integer.valueOf(math.abs(h))
        case BitDepth => Integer.valueOf(le16(b, 28))
        case Channels => bmpChannels(le16(b, 28))
        case _ => null
      }
    } else null
}

/** `format(payload)`: "png" / "bmp" / NULL. */
case class ImageFormat(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft image format expects BINARY, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ImageHeader.format(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ImageHeader.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"""org.apache.spark.unsafe.types.UTF8String r = $kernel.format($a);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One integer header field (see [[ImageHeader]] selectors): width,
  * height, bit depth, or channel count. NULL when unparseable. */
case class ImageHeaderInt(child: Expression, fieldSel: Int) extends UnaryExpression {

  require(fieldSel >= ImageHeader.Width && fieldSel <= ImageHeader.Channels,
    s"unknown image header field selector $fieldSel")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft image header expects BINARY, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ImageHeader.field(input.asInstanceOf[Array[Byte]], fieldSel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ImageHeader.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"""java.lang.Integer r = $kernel.field($a, $fieldSel);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.intValue(); }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

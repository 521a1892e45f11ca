package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Z-order (Morton) interleave of two LONG dimensions — the data-layout
 * primitive: sorting / range-partitioning by `z` co-locates rows that are
 * close in BOTH dimensions, so a 2-D selective scan (user × item, lat ×
 * lon, time-bucket × key) touches a contiguous band of files instead of
 * all of them. At 100 TB this is the difference between pruning to a few
 * hundred parquet files and reading every one: min/max column stats of a
 * z-sorted file bound BOTH dimensions at once.
 *
 * Semantics (mirrored exactly by the DuckDB oracle): each input is masked
 * to its low 31 bits, bit-spread with the standard mask chain, and
 * interleaved x-even / y-odd into a non-negative 62-bit z value.
 * Codegen'd — straight-line shift/mask arithmetic, no branches.
 */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder expects (LONG, LONG), got $other")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder2.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import ZOrder2._
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val gx = ctx.freshName("zx")
      val gy = ctx.freshName("zy")
      def chain(v: String): String =
        s"""$v = $v & 2147483647L;
           |$v = ($v | ($v << 16)) & ${M16}L;
           |$v = ($v | ($v << 8)) & ${M8}L;
           |$v = ($v | ($v << 4)) & ${M4}L;
           |$v = ($v | ($v << 2)) & ${M2}L;
           |$v = ($v | ($v << 1)) & ${M1}L;""".stripMargin
      s"""long $gx = $x;
         |long $gy = $y;
         |${chain(gx)}
         |${chain(gy)}
         |${ev.value} = $gx | ($gy << 1);""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  // standard Morton bit-spread mask chain (each step doubles the gap)
  final val M16 = 0x0000FFFF0000FFFFL
  final val M8  = 0x00FF00FF00FF00FFL
  final val M4  = 0x0F0F0F0F0F0F0F0FL
  final val M2  = 0x3333333333333333L
  final val M1  = 0x5555555555555555L

  def spread(v0: Long): Long = {
    var v = v0 & 0x7FFFFFFFL
    v = (v | (v << 16)) & M16
    v = (v | (v << 8)) & M8
    v = (v | (v << 4)) & M4
    v = (v | (v << 2)) & M2
    v = (v | (v << 1)) & M1
    v
  }

  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}

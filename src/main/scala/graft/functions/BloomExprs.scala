package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/**
 * Codegen'd Bloom-filter membership probe: `BloomMightContain(longChild,
 * serializedBloom)` evaluates `bloom.mightContainLong(child)` inside
 * whole-stage codegen. The serialized sketch rides in the expression tree
 * (a few hundred KB for millions of keys at 1% fpp — same order as a
 * broadcast hash-relation's metadata) and is deserialized once per
 * executor-task via lazy mutable state, NOT per row.
 *
 * This is the probe half of [[graft.operators.BloomJoin]]: the public
 * `org.apache.spark.util.sketch.BloomFilter` the build side produced is
 * checked at scan speed, before any shuffle. Only the child expression is
 * a tree child — the sketch is config, like the literal params of the
 * other graft expressions (SketchExprs.scala).
 */
/** Content-equal wrapper for a serialized sketch. A raw `Array[Byte]`
  * case-class field has referential equals/hashCode, so Catalyst
  * canonicalization / `semanticEquals` would never identify two probes
  * carrying identical sketches — missed common-subexpression reuse and
  * spurious plan inequality (exchange/subquery reuse keys on canonical
  * plans). Equality here is by content; hashCode is computed once. */
final class SketchBytes(val bytes: Array[Byte]) extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case s: SketchBytes => java.util.Arrays.equals(bytes, s.bytes)
    case _ => false
  }
  override val hashCode: Int = java.util.Arrays.hashCode(bytes)
  override def toString: String = s"SketchBytes(${bytes.length}B,h=$hashCode)"
}

object BloomMightContain {
  /** Call-site convenience: wrap the raw serialized sketch. */
  def apply(child: Expression, bytes: Array[Byte]): BloomMightContain =
    BloomMightContain(child, new SketchBytes(bytes))
}

case class BloomMightContain(child: Expression, bloomBytes: SketchBytes)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft bloom probe expects a LONG key (hash wider types with xxhash64 first), got $other")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes.bytes))

  override def nullSafeEval(value: Any): Any =
    bloom.mightContainLong(value.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("graftBloomBytes", bloomBytes.bytes, "byte[]")
    val bloomCls = classOf[BloomFilter].getName
    // deserialized once in the generated class's constructor, reused row-wise
    val bloomVar = ctx.addMutableState(bloomCls, "graftBloom",
      v => s"""try { $v = $bloomCls.readFrom(new java.io.ByteArrayInputStream($bytesRef)); }
              |catch (java.io.IOException e) { throw new RuntimeException(e); }""".stripMargin)
    defineCodeGen(ctx, ev, c => s"$bloomVar.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

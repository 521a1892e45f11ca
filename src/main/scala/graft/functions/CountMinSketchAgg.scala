package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Count-min sketch (Cormode & Muthukrishnan '05) as a
 * `TypedImperativeAggregate`: the bounded-state answer to "how often does
 * each key occur" when the key space is too large for an exact groupBy.
 * State is a fixed `depth × width` counter matrix regardless of input
 * size, partial aggregates merge by element-wise addition, and the
 * serialized form is a plain little-endian long array — so sketches can be
 * persisted and merged across jobs (the property the space-saving top-k
 * Aggregator in `ext.TopK` deliberately trades away for exactness on hot
 * keys).
 *
 * Input is a PRE-HASHED key (`bigint`, normally `TextAnalysis.hash32`) so
 * the row hash stays the portable md5-based one every other sketch in this
 * engine uses — and so the DuckDB oracle can reproduce estimates exactly:
 * row j of the matrix uses the same `((2j+1)*h + (104729j+12345)) mod P`
 * permutation family as the minhash signatures, and the estimate for a key
 * is `min over j of counter[j][perm_j(h) mod width]`.
 *
 * Estimates are read back in plain SQL over the emitted `array<bigint>`
 * (length `depth*width`, row-major): see `TextAnalysis.cmsTokenCounts`.
 */
case class CountMinSketchAgg(
    child: Expression,
    weight: Expression = org.apache.spark.sql.catalyst.expressions.Literal(1L, LongType),
    width: Int = 256,
    depth: Int = 4,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  // fail at analysis (construction), not as a mid-job ArithmeticException /
  // NegativeArraySizeException inside an executor task
  require(width > 0, s"graft_cms width must be positive, got $width")
  require(depth > 0, s"graft_cms depth must be positive, got $depth")

  val Prime: Long = 4294967311L // same universal-hash prime as MinHashSignature

  override def left: Expression = child
  override def right: Expression = weight

  // The key must be bigint (pre-hashed contract); the weight accepts any
  // integral type and widens in update() — ImplicitCastInputTypes would be
  // the idiomatic coercion but its AbstractDataType signature is
  // private[sql] in Spark 4.1, unextendable from user packages, so
  // `graft_cms(h, 2)` with an integer-literal weight coerces here instead.
  override def checkInputDataTypes(): TypeCheckResult = (child.dataType, weight.dataType) match {
    case (LongType, LongType | IntegerType | ShortType | ByteType) =>
      TypeCheckResult.TypeCheckSuccess
    case (c, w) => TypeCheckResult.TypeCheckFailure(
      s"graft_cms expects (bigint pre-hashed key[, integral weight]) — use graft.TextAnalysis.hash32 — got ($c, $w)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](width * depth)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    val w = weight.eval(input)
    // weighted insert: a pre-aggregated (key, count) stream updates in one
    // row what per-occurrence streams update count times — same sketch
    if (v != null && w != null) {
      val h = v.asInstanceOf[Long]
      val inc = w.asInstanceOf[Number].longValue()
      var j = 0
      while (j < depth) {
        // floorMod: negative caller-supplied hashes must still land in-range
        val b = java.lang.Math.floorMod(
          java.lang.Math.floorMod((2L * j + 1L) * h + (104729L * j + 12345L), Prime), width.toLong).toInt
        buf(j * width + b) += inc
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, weight = newRight)
}

object CountMinSketchAgg {
  /** SQL-registry builder: `graft_cms(hash)`, `graft_cms(hash, weight)`,
    * or `graft_cms(hash, weight, <width literal>, <depth literal>)`. */
  def fromExprs(exprs: Seq[Expression]): CountMinSketchAgg = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    exprs match {
      case Seq(h) => CountMinSketchAgg(h)
      case Seq(h, w) => CountMinSketchAgg(h, w)
      case Seq(h, w, Literal(wd: Int, IntegerType), Literal(dp: Int, IntegerType)) =>
        CountMinSketchAgg(h, w, wd, dp)
      case other => throw new IllegalArgumentException(
        "graft_cms(hash[, weight[, <width literal>, <depth literal>]]) — got " + other)
    }
  }
}

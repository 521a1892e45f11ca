package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
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
    width: Int = 256,
    depth: Int = 4,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  val Prime: Long = 4294967311L // same universal-hash prime as MinHashSignature

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cms expects a bigint pre-hashed key (use graft.TextAnalysis.hash32), got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](width * depth)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < depth) {
        // floorMod: negative caller-supplied hashes must still land in-range
        val b = java.lang.Math.floorMod(
          java.lang.Math.floorMod((2L * j + 1L) * h + (104729L * j + 12345L), Prime), width.toLong).toInt
        buf(j * width + b) += 1L
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
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

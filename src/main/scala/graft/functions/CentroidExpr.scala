package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Literal codebook rider for [[NearestCentroid]]: centroid ids (sorted
 * ascending — the tiebreak order), embeddings, and precomputed L2 norms.
 * Content-based equality for the same reason as [[SketchBytes]]: raw
 * arrays have referential equals, which would defeat canonicalization
 * and subexpression reuse for two expressions carrying the same trained
 * codebook.
 */
final class Codebook(val ids: Array[Long], val embs: Array[Array[Float]],
                     val nrms: Array[Double]) extends Serializable {
  require(ids.length == embs.length && ids.length == nrms.length,
    s"ragged codebook: ${ids.length} ids, ${embs.length} embeddings, ${nrms.length} norms")
  require(ids.nonEmpty, "empty codebook — guard at the call site")
  require((1 until ids.length).forall(i => ids(i - 1) < ids(i)),
    "codebook ids must be strictly ascending (the argmax tiebreak order)")
  // A zero norm makes that centroid's divisor 0 for EVERY row — the window
  // form this expression replaced THROWS there (ANSI Divide raises
  // DIVIDE_BY_ZERO on a zero divisor even for doubles — empirically pinned
  // in ExtSpec), while the fold's Java 0/0 is a NaN that silently never
  // wins; a NaN/Inf norm likewise turns a loud degenerate input into a
  // silent skip. Reject both at construction so the error-vs-fallback
  // divergence is unrepresentable.
  require(nrms.forall(n => n > 0 && !n.isNaN && !n.isInfinity),
    "codebook norms must be positive finite (the rank-1 window form throws on " +
      "a zero-norm centroid where this fold would silently skip it — drop " +
      "degenerate centroids first)")
  override def equals(o: Any): Boolean = o match {
    case c: Codebook => java.util.Arrays.equals(ids, c.ids) &&
      java.util.Arrays.equals(nrms, c.nrms) &&
      embs.length == c.embs.length &&
      embs.indices.forall(i => java.util.Arrays.equals(embs(i), c.embs(i)))
    case _ => false
  }
  override val hashCode: Int = {
    var h = java.util.Arrays.hashCode(ids) * 31 + java.util.Arrays.hashCode(nrms)
    embs.foreach(e => h = h * 31 + java.util.Arrays.hashCode(e))
    h
  }
  override def toString: String = s"Codebook(k=${ids.length},h=$hashCode)"
}

/**
 * Codegen'd nearest-centroid assignment: for a row's (embedding, nrm),
 * the `cent_id` maximizing `dot(embedding, cent_emb) / (nrm · cent_nrm)`,
 * ties to the smallest cent_id — bit-identical to the
 * `rank 1 over (cosine desc, cent_id asc)` window form the IVF/semantic-
 * dedup operators used, but evaluated as a NARROW scalar: no crossJoin
 * row blow-up and no rank window, so assignment never forces the
 * `Exchange(vec_id)` that shuffled every corpus embedding.
 *
 * Per-centroid cosine mirrors `graft_dot` ([[DotProductFloat]]) exactly:
 * sequential index-order double fold, and a RAGGED centroid (length ≠
 * embedding length) contributes a null cosine — skipped, as the window
 * form's `desc` NULLS-LAST ordering loses nulls to any real cosine. A
 * row where NO centroid yields a comparable cosine (all ragged, or all
 * NaN from a zero-norm ROW vector) falls back to the smallest cent_id.
 * On zero norms this is strictly MORE tolerant than the window it
 * replaced: Spark's ANSI `Divide` raises DIVIDE_BY_ZERO on a zero
 * divisor even for DOUBLES (IEEE semantics apply only with ANSI off —
 * the throw is pinned empirically in ExtSpec), where this expression's
 * Java 0/0 is a NaN that simply never wins the fold. The same throw-vs-
 * skip divergence on a zero-norm CENTROID is unrepresentable:
 * [[Codebook]] rejects non-positive/non-finite norms at construction.
 *
 * The codebook rides the expression as config (like [[SketchBytes]]),
 * referenced once per generated class — k·dim floats, fine through
 * k ~ 10^4; beyond that cut k with a coarse quantization level first.
 */
case class NearestCentroid(left: Expression, right: Expression, codebook: Codebook)
    extends BinaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft nearest-centroid expects (array<float> embedding, double nrm), got $other")
    }

  override def nullSafeEval(e: Any, n: Any): Any = {
    val emb = e.asInstanceOf[ArrayData]
    val nrm = n.asInstanceOf[Double]
    val dim = emb.numElements()
    var bid = -1L
    var bcos = Double.NegativeInfinity
    var c = 0
    while (c < codebook.ids.length) {
      val ce = codebook.embs(c)
      if (ce.length == dim) {
        var s = 0.0
        var i = 0
        while (i < dim) { s += emb.getFloat(i).toDouble * ce(i).toDouble; i += 1 }
        val cos = s / (nrm * codebook.nrms(c))
        if (cos > bcos) { bcos = cos; bid = codebook.ids(c) }
      }
      c += 1
    }
    if (bid == -1L) codebook.ids(0) else bid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, n) => {
      val cb = ctx.addReferenceObj("codebook", codebook, classOf[Codebook].getName)
      val dim = ctx.freshName("dim")
      val bid = ctx.freshName("bid")
      val bcos = ctx.freshName("bcos")
      val c = ctx.freshName("c")
      val ce = ctx.freshName("ce")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cos = ctx.freshName("cos")
      s"""
         |int $dim = $e.numElements();
         |long $bid = -1L;
         |double $bcos = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $cb.ids().length; $c++) {
         |  float[] $ce = $cb.embs()[$c];
         |  if ($ce.length == $dim) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $s += ((double) $e.getFloat($i)) * ((double) $ce[$i]);
         |    }
         |    double $cos = $s / ($n * $cb.nrms()[$c]);
         |    if ($cos > $bcos) { $bcos = $cos; $bid = $cb.ids()[$c]; }
         |  }
         |}
         |${ev.value} = ($bid == -1L) ? $cb.ids()[0] : $bid;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

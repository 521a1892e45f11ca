package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd whitespace tokenizer — the compiled replacement for the map
 * floor every text query shares: `split(trim(lower(text)), "\\s+")`.
 *
 * Why: Spark's `StringSplit` with a multi-char pattern routes through
 * `java.lang.String.split`, which has no fast path for `"\s+"` — it
 * compiles the regex PER ROW, after materializing the UTF8String into a
 * java String (and `lower`/`trim` each allocate their own intermediate
 * copy first). The round-9 TopKProbe put the tokenize+explode floor at
 * ~4 s of the 5.9 s sf10 q_spacesaving_topk wall — shared with every
 * text-grain query in the engine. This expression does lowercase + trim +
 * split in one pass over the raw bytes, no regex, no java String.
 *
 * Semantics are BYTE-IDENTICAL to `split(trim(lower(s)), "\\s+")`,
 * including the edges (pinned by a property test vs the built-in form):
 *  - `lower` via `UTF8String.toLowerCase` (the same call `lower` makes);
 *  - `trim` strips 0x20 ONLY (Spark trim semantics), not tabs/newlines;
 *  - Java `\s` is ASCII-only: `[ \t\n\x0B\f\r]` — U+00A0 / U+2003 etc.
 *    are NOT separators, so splitting on raw bytes is UTF-8 safe (all
 *    separators < 0x80 never occur inside a multi-byte sequence);
 *  - Spark's `split` passes limit=-1 (NOT Java's default 0), so EVERY
 *    separator run produces a boundary: result length = ws-runs + 1,
 *    with empty pieces kept at BOTH ends — `"\ta b"` → `["","a","b"]`,
 *    `"a\n"` → `["a",""]`, `"\t"` → `["",""]` (the first parity-test
 *    run caught exactly this Java-vs-Spark limit divergence);
 *  - empty input (or all-spaces, trimmed to empty) → `[""]`.
 *
 * 100 TB shape: this is a narrow map — no partitioning consequence; the
 * win is pure per-row CPU inside whole-stage codegen (the generated code
 * calls the static [[TokenExprs.whitespaceTokens]], same pattern as the
 * sketch expressions in this package).
 */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_tokens expects string, got $t")
  }

  // matches StringSplit's dataType: pieces of a non-null string are never null
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenExprs.whitespaceTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenExprs.whitespaceTokens($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Count (with multiplicity) of array elements present in a static word
 * set — the compiled form of `size(filter(toks, t -> t IN ('w1','w2',…)))`
 * that qualityScore (stopword ratio) and langId (per-language dictionary
 * hits) fold over every token of every document. The HOF form runs its
 * lambda interpreted — per token, per dictionary, a virtual-call chain
 * plus an In evaluation; this is one hash probe per token inside
 * whole-stage codegen. Value-identical: multiplicity is kept (filter
 * keeps duplicates), a null array yields null (size(filter(null)) is
 * null), and null ELEMENTS don't count (IN over a null yields null →
 * filter drops the element).
 */
case class CountInSet(child: Expression, words: Seq[String]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"CountInSet expects array<string>, got $t")
  }

  override def dataType: DataType = IntegerType

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    TokenExprs.countInSet(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenExprs.countInSet($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenExprs {

  @inline private def isWs(c: Byte): Boolean =
    c == 0x20 || (c >= 0x09 && c <= 0x0D)

  /** One hash probe per element; see [[CountInSet]] for the pinned
    * null/multiplicity semantics. Called from generated code. */
  def countInSet(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var i = 0
    var c = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  private val EmptyToken: ArrayData =
    new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))

  /** `split(trim(lower(s)), "\\s+")` in one byte pass — see
    * [[WhitespaceTokens]] for the pinned edge semantics. Called from
    * generated code; must stay static and allocation-lean. */
  def whitespaceTokens(s: UTF8String): ArrayData = {
    val t = s.toLowerCase.trim()
    val n = t.numBytes
    if (n == 0) return EmptyToken
    val b = t.getBytes
    // pass 1: count separator runs (exact-size allocation beats a
    // growable builder — docs are short and the scan is branch-cheap)
    var runs = 0
    var i = 0
    while (i < n) {
      if (isWs(b(i))) {
        runs += 1
        while (i < n && isWs(b(i))) i += 1
      } else i += 1
    }
    // limit=-1 split: one piece per gap between runs, ends included
    val out = new Array[Any](runs + 1)
    var k = 0
    var start = 0
    i = 0
    while (i < n) {
      if (isWs(b(i))) {
        out(k) = UTF8String.fromBytes(b, start, i - start)
        k += 1
        while (i < n && isWs(b(i))) i += 1
        start = i
      } else i += 1
    }
    out(k) = UTF8String.fromBytes(b, start, n - start)
    new GenericArrayData(out)
  }
}

package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Content-defined chunk boundaries via a Rabin-Karp rolling
  * polynomial hash — the rsync/LBFS/FastCDC family of chunking, used
  * in a data pipeline to split documents at CONTENT-stable positions
  * so that an edited document re-chunks into mostly-identical pieces
  * (fixed-size chunking shifts every boundary after an insertion,
  * defeating chunk-level dedup).
  *
  * A custom Catalyst `Expression` because the rolling recurrence
  * h(i+1) = (h(i) − cp(i−w+1)·B^(w−1))·B + cp(i+1) mod M is ONE
  * multiply-add per character, while any built-in composition must
  * rehash every w-char window from scratch — O(n·w) work and an
  * exploded position row per character at 100 TB. The oracle CAN take
  * the O(n·w) road at test scale, because the window polynomial sum
  * equals the rolled value mod M exactly — integer-exact cross-engine.
  *
  * Returns the 1-based code-point positions of each window END whose
  * hash satisfies h mod `div` == 0 (expected chunk size ≈ `div`
  * chars). No min/max chunk clamping: clamped variants (FastCDC)
  * make cut k depend on cut k−1 — sequential state that belongs in a
  * per-document loop, NOT in the relational contract; mask-only cuts
  * keep the boundary set a pure per-position predicate both engines
  * can reproduce. Constants: B = 257, M = 2³¹−1 (Mersenne —
  * products stay inside 63 bits).
  */
case class RabinBoundaries(child: Expression, w: Int, div: Int)
    extends UnaryExpression {
  require(w > 0 && div > 0, s"need positive window/divisor, got $w/$div")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rabin_boundaries requires STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "rabin_boundaries"

  override def nullSafeEval(input: Any): Any = boundaries(input)

  private val B = 257L
  private val M = 2147483647L // 2^31 − 1

  /** Called from generated code too (whole-stage codegen stays intact). */
  def boundaries(input: Any): GenericArrayData = {
    val s = input.toString
    // code points, not UTF-16 units: DuckDB's substr/ord are
    // code-point-based, and the contract must match it exactly
    val cps = s.codePoints().toArray
    val n = cps.length
    val out = new java.util.ArrayList[Any]()
    if (n >= w) {
      // B^(w−1) mod M, for ejecting the outgoing character
      var bw = 1L
      var j = 1
      while (j < w) { bw = bw * B % M; j += 1 }
      var h = 0L
      var i = 0
      while (i < n) {
        h = if (i < w) (h * B + cps(i)) % M
            else Math.floorMod((h - cps(i - w) * bw % M) * B + cps(i), M)
        if (i >= w - 1 && h % div == 0)
          out.add(java.lang.Integer.valueOf(i + 1)) // 1-based end position
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rabinExpr", this,
      classOf[RabinBoundaries].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.boundaries($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RabinBoundaries =
    copy(child = newChild)
}

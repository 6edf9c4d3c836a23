package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused dot product over two ArrayType(Float|Double) columns — the
  * dot-only sibling of [[CosineSimilarity]], for scorers that
  * precompute per-vector norms: an N²-pair ranking recomputes each
  * norm N times inside the fused cosine (3 multiply-adds per element
  * per pair), while dot + precomputed norms does 1 — the difference
  * between 3N² and N²+2N element ops over a corpus
  * ([[graft.functions.Similarity.knnJoin]]).
  *
  * Fold order is ascending-index sequential adds in double — bit-
  * identical to the DuckDB `list_sum∘list_transform` oracle, so
  * `dot / (na * nb)` with norms precomputed the same way on both
  * sides reproduces the fused-cosine value exactly. Mismatched
  * lengths return NULL (same contract as [[CosineSimilarity]]).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires ARRAY<FLOAT|DOUBLE> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def isFloat(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val af = isFloat(left.dataType)
    val bf = isFloat(right.dataType)
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val getA = if (isFloat(left.dataType)) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val getB = if (isFloat(right.dataType)) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $dot += ($getA) * ($getB);
          }
          ${ev.value} = $dot;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

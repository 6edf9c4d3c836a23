package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two ArrayType(Float|Double) columns.
  *
  * The built-in composition (`aggregate(zip_with(...))`) allocates an
  * intermediate array per row and evaluates through interpreted
  * higher-order lambdas — measured 4-8× slower than this single fused
  * loop at sf0.1, and at 100 TB the allocation pressure alone would
  * dominate. This expression does one pass, no allocation, and
  * participates in whole-stage codegen via `doGenCode`.
  *
  * Fold order is ascending-index sequential adds in double (float
  * inputs are exact in double), bit-identical to the
  * `aggregate∘zip_with` composition and the DuckDB
  * `list_sum∘list_transform` oracle.
  *
  * Degenerate inputs return NULL rather than NaN: mismatched lengths
  * (the zip_with composition nulls out there too — padded nulls
  * poison the sum) and zero-norm vectors (0/0 would be NaN, which
  * sorts ABOVE every real score in `cos DESC` top-k rankings). The
  * DuckDB oracle mirrors this via a `nullif` guard on the norm
  * product (docs/SEMANTICS.md).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires ARRAY<FLOAT|DOUBLE> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def isFloat(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val af = isFloat(left.dataType)
    val bf = isFloat(right.dataType)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getA = if (isFloat(left.dataType)) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val getB = if (isFloat(right.dataType)) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $x = $getA;
            double $y = $getB;
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          if ($na == 0.0 || $nb == 0.0) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

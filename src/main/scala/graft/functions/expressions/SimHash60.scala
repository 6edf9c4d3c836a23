package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash over a token array — a custom Catalyst `Expression`
  * because no composition of built-ins can fold per-token hash bits
  * into a weighted bit-majority without exploding tokens×bits rows
  * (a 64× row blow-up that would dominate the shuffle at 100 TB; here
  * it is one pass over each token list, no extra rows).
  *
  * Token hash = first 15 hex chars of md5 (60 bits) — the same
  * md5-derived hash as [[graft.functions.Dedup.md5Hash60]], chosen so
  * a SQL oracle can reproduce the value exactly. Bit i of the result
  * is 1 iff more tokens have bit i set than clear (strict majority,
  * ties → 0). SimHash per Charikar (STOC'02) as popularized for
  * near-dup detection of web corpora.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(simhash(input.asInstanceOf[ArrayData]))

  /** Called from generated code too (whole-stage codegen stays intact). */
  def simhash(arr: ArrayData): Long = {
    val acc = new Array[Int](60)
    val md = MessageDigest.getInstance("MD5")
    var k = 0
    while (k < arr.numElements()) {
      if (!arr.isNullAt(k)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(k).getBytes)
        // first 15 hex chars == high 60 bits of the first 8 digest
        // bytes, i.e. (first8BytesBigEndian >>> 4)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
        h = h >>> 4
        var i = 0
        while (i < 60) {
          if (((h >> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
      k += 1
    }
    var res = 0L
    var i = 0
    while (i < 60) { if (acc(i) > 0) res |= 1L << i; i += 1 }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhashExpr", this, classOf[SimHash60].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.simhash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

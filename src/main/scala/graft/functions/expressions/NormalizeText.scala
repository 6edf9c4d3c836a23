package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization — equivalent to
  * `trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))` but as one
  * byte-level pass instead of a regex engine invocation per row.
  *
  * Equivalence argument: lowercase via UTF8String.toLowerCase (the
  * same call Spark's `lower` makes), then every byte outside ASCII
  * [a-z0-9] opens/extends a separator run. Multi-byte UTF-8 sequences
  * consist entirely of bytes ≥ 0x80 (outside [a-z0-9]), so a run of
  * non-ASCII codepoints collapses to one space exactly as the regex's
  * `[^a-z0-9]+` does. Runs at the edges are trimmed.
  *
  * This sits under every text operator (fingerprint, shingles,
  * simhash, language ID, quality ratios), so at 100 TB it is the
  * single hottest scalar in the curation pipeline.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  /** Called from generated code too — keeps the surrounding operators
    * inside whole-stage codegen (one virtual call per row instead of a
    * CodegenFallback pipeline break). */
  def normalize(input: UTF8String): UTF8String = {
    val lowered = input.toLowerCase.getBytes
    val out = new Array[Byte](lowered.length)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < lowered.length) {
      val b = lowered(i)
      val keep = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (keep) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = b; o += 1
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("normalizeText", this, classOf[NormalizeText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.normalize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

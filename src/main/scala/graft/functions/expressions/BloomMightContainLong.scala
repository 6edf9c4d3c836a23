package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `mightContain(key)` against a pre-built Bloom filter, as a codegen
  * Catalyst expression — the executor-side half of a runtime semi-join
  * filter ([[graft.operators.BloomJoin]]).
  *
  * The filter travels as its serialized bytes inside the expression
  * (so it rides the task binary to every executor exactly once) and is
  * deserialized lazily per executor instance. A Scala UDF closing over
  * the filter would black-box the predicate and break whole-stage
  * codegen right at the scan, where this filter must sit to pay off.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires BIGINT, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(might(input.asInstanceOf[Long]))

  /** Called from generated code too (whole-stage codegen stays intact). */
  def might(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.might($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong = copy(child = newChild)
}

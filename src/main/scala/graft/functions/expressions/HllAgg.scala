package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-group HyperLogLog as a native `TypedImperativeAggregate`, on
  * the SAME md5-derived 60-bit hash as
  * [[graft.functions.Dedup.md5Hash60]] — so unlike Spark's
  * `approx_count_distinct` (whose HLL++ registers are opaque to other
  * engines) the register state is reproducible in a SQL oracle, and
  * the whole aggregate is hash-checkable cross-engine, per group.
  *
  * Buffer = 2^p bytes, one max-rho per register (rho ≤ 61 fits a
  * byte); merge = bytewise max — the mergeable-summary shape that
  * makes distributed distinct-count O(2^p) per partial instead of a
  * distinct shuffle of the key stream. Output is INTEGER-only state:
  * (n_zero_registers, sum_rho, inv_scaled) with inv_scaled =
  * Σ 2^(61−p−rho_j) — the harmonic sum Σ2^-rho scaled by 2^(61−p)
  * into an exact BIGINT (rho ≤ 61−p, so every term is integral and
  * the total stays ≤ 2^61). The float estimate (alpha·m²/Σ2^-rho, linear counting on
  * the small range) is a pure function of this state, computed by
  * [[graft.functions.Sketches.hllEstimate]] on the consumer side:
  * floats deliberately do NOT cross the oracle surface (ln/division
  * ULPs differ between engines; sum order of doubles is
  * engine-dependent — the integer state is what both engines can
  * reproduce bit-for-bit).
  */
case class HllAgg(
    child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 12, s"p out of range [4,12]: $p")
  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_zero_registers", LongType),
    StructField("sum_rho", LongType),
    StructField("inv_scaled", LongType)))
  override def prettyName: String = "hll_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_distinct requires STRING input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(v.asInstanceOf[UTF8String].getBytes)
      // first 15 hex chars == high 60 bits of the first 8 digest bytes
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
      h = h >>> 4
      val reg = (h % m).toInt
      val w = h >>> p
      val rho = (if (w == 0) 60 - p + 1
                 else 60 - p + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w)))
        .toByte
      if (rho > buf(reg)) buf(reg) = rho
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var zeros = 0L
    var sumRho = 0L
    var invScaled = 0L
    var i = 0
    while (i < m) {
      val r = buf(i).toInt
      if (r == 0) zeros += 1
      sumRho += r
      invScaled += 1L << (61 - p - r) // rho ≤ 61−p; 2^p terms ≤ 2^61
      i += 1
    }
    InternalRow(zeros, sumRho, invScaled)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
}

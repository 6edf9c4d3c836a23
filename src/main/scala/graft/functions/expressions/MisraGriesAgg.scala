package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries / SpaceSaving heavy-hitter sketch as a native
  * `TypedImperativeAggregate`: the one-pass, mergeable, bounded-memory
  * answer to "top tokens over a 100 TB corpus" — the exact
  * `groupBy(token).count.orderBy.limit` needs a full shuffle of the
  * token stream, while this keeps `capacity` counters per partial
  * aggregate and merges them map-side like any other partial agg
  * (it runs inside `ObjectHashAggregateExec`, the same machinery as
  * `percentile_approx` / `count_min_sketch`).
  *
  * Guarantees (n = total weight seen): every key with true count
  * > n/(capacity+1) is present in the sketch, and every estimate lies
  * in [true − n/(capacity+1), true] — under ANY partitioning and merge
  * order. When the distinct-key count never exceeds `capacity` the
  * sketch is EXACT (no decrement ever fires), which is what makes the
  * `q_heavy_hitters` oracle possible; the lossy regime is
  * spec-asserted via its bounds instead (SketchSpec).
  *
  * Update is decrement-by-min Misra-Gries (O(capacity) only on
  * overflow); merge is union-then-shrink by the (capacity+1)-th
  * largest (Agarwal et al., "Mergeable Summaries", PODS'12).
  * Output: `array<struct<token,est>>` ordered (est DESC, token ASC) —
  * deterministic whenever the sketch is exact.
  */
case class MisraGriesAgg(
    child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType),
                   StructField("est", LongType))), containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters requires STRING input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    new mutable.HashMap[UTF8String, Long]()

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[UTF8String]
      buf.get(x) match {
        case Some(c) => buf.update(x, c + 1L)
        case None if buf.size < capacity =>
          buf.update(x.clone(), 1L) // clone: input strings alias scan buffers
        case None =>
          // decrement-by-min: removes ≥ (capacity+1)·m total weight,
          // so cumulative decrements stay ≤ n/(capacity+1)
          val m = math.min(buf.valuesIterator.min, 1L)
          val entries = buf.toArray
          buf.clear()
          entries.foreach { case (k, c) => if (c - m > 0) buf.update(k, c - m) }
          if (1L - m > 0) buf.update(x.clone(), 1L - m)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      // shrink by the (capacity+1)-th largest count: ≤ capacity keys
      // can be strictly above it, and the subtraction's total removed
      // weight ≥ (capacity+1)·threshold keeps the MG error invariant
      val sorted = buf.valuesIterator.toArray.sortInPlace()(
        Ordering[Long].reverse)
      val threshold = sorted(capacity)
      val entries = buf.toArray
      buf.clear()
      entries.foreach { case (k, c) =>
        if (c - threshold > 0) buf.update(k, c - threshold)
      }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (k, c) => (-c, k) } // est DESC, token ASC (binary)
      .map { case (k, c) => InternalRow(k, c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val m = new mutable.HashMap[UTF8String, Long]()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      m.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

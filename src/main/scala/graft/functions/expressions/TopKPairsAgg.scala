package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap per-group top-k as a native `TypedImperativeAggregate`
  * — the scale-correct replacement for the
  * `row_number().over(Window.partitionBy(g).orderBy(score.desc)) <= k`
  * idiom. The window form SORTS every group's full row set (O(n log n)
  * per group, all rows shuffled and buffered); this keeps a k-element
  * min-heap per partial aggregate (O(n log k), constant memory) and
  * merges heaps map-side, so the shuffle carries k pairs per group per
  * map task instead of the whole group. Same machinery as
  * [[MisraGriesAgg]] (`ObjectHashAggregateExec`).
  *
  * Input: (score DOUBLE, id BIGINT). Output:
  * `array<struct<score,id>>` ordered score DESC, id ASC — ties on
  * score break to the SMALLER id, so the result is deterministic and
  * a SQL `row_number` oracle reproduces it exactly. NaN scores are
  * ignored (a NaN would poison heap ordering); null score or id too.
  */
case class TopKPairsAgg(
    scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType),
                   StructField("id", LongType))), containsNull = false)
  override def prettyName: String = "topk_pairs"

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_pairs requires (DOUBLE, BIGINT), got " +
          s"(${s.catalogString}, ${i.catalogString})")
    }

  // min-heap: root = the entry to evict = lowest score, ties to the
  // LARGER id (since ties keep the smaller id)
  private def newHeap(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k,
      (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      })

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    newHeap()

  private def offer(heap: java.util.PriorityQueue[(Double, Long)],
                    score: Double, id: Long): Unit = {
    if (!java.lang.Double.isNaN(score)) {
      if (heap.size < k) heap.add((score, id))
      else {
        val root = heap.peek()
        if (score > root._1 || (score == root._1 && id < root._2)) {
          heap.poll(); heap.add((score, id))
        }
      }
    }
  }

  override def update(heap: java.util.PriorityQueue[(Double, Long)],
                      input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      offer(heap, s.asInstanceOf[Double], i.asInstanceOf[Long])
    heap
  }

  override def merge(heap: java.util.PriorityQueue[(Double, Long)],
                     other: java.util.PriorityQueue[(Double, Long)])
      : java.util.PriorityQueue[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val (s, i) = it.next(); offer(heap, s, i) }
    heap
  }

  override def eval(heap: java.util.PriorityQueue[(Double, Long)]): Any = {
    val arr = new Array[(Double, Long)](heap.size)
    var i = 0
    val it = heap.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    val rows = arr.sortBy { case (s, id) => (-s, id) }
      .map { case (s, id) => InternalRow(s, id) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(heap: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) {
      val (s, i) = it.next()
      out.writeDouble(s); out.writeLong(i)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val heap = newHeap()
    val n = in.readInt()
    var i = 0
    while (i < n) { offer(heap, in.readDouble(), in.readLong()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact bounded top-k by score as a mergeable aggregate — the
  * scale-correct form of "per-group top-k" for ANN reranking: each
  * partial keeps a k-sized heap per group, so the map side emits at
  * most k (score, id) entries per (task, group) and the shuffle
  * carries |tasks|·|groups|·k entries instead of every scored row.
  * A `row_number() OVER (PARTITION BY group ORDER BY score)` window
  * computes the same answer by shuffling ALL scored rows to |groups|
  * reducers and fully sorting each — at |corpus|·|queries| scored
  * rows that reducer sort is the bottleneck this aggregate removes.
  *
  * Determinism: ordering is (score desc, id asc) — ties on score
  * resolve by id, so the result is a pure function of the input set,
  * independent of partitioning and merge order.
  *
  * Runs under ObjectHashAggregateExec (partial → final). With more
  * in-flight groups per task than
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * (default 128) the partial falls back to sort-based aggregation —
  * still map-side and correct, just sorted; raise the threshold when
  * one task sees many thousands of query groups.
  */
case class TopKPairsSummary(score: Expression, id: Expression, k: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k >= 1, s"need k >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk_pairs expects (double, bigint), got " +
          s"(${s.simpleString}, ${i.simpleString})")
    }

  // min-heap whose head is the WORST kept entry under
  // (score desc, id asc): head = lowest score, ties → highest id
  private def heapOrdering: Ordering[(Double, Long)] =
    Ordering.fromLessThan { (a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrdering)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    s: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      if (s > ws || (s == ws && i < wi)) {
        buf.dequeue(); buf.enqueue((s, i))
      }
    }
    ()
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
                     b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { case (s, i) => offer(a, s, i) }
    a
  }

  /** Rank order: best first — array index + 1 IS the rank. */
  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr, Ordering.fromLessThan[(Double, Long)] {
      (a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    })
    new GenericArrayData(arr.map { case (s, i) =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](i, s))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.enqueue((bb.getDouble, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsSummary =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsSummary =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsSummary =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKPairsAggregate {
  /** Exact top-k (id, score) pairs per group by (score desc, id asc):
    * array<struct<neighbor_id, cos>> in rank order. */
  def topKPairs(score: Column, id: Column, k: Int): Column =
    GraftColumnShim.column(TopKPairsSummary(
      GraftColumnShim.expression(score),
      GraftColumnShim.expression(id), k).toAggregateExpression())
}

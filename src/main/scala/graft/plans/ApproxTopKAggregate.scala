package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Approximate heavy hitters (top-k frequent items) as a mergeable
  * Misra-Gries summary — the 100 TB path for "most frequent terms":
  * fixed `capacity` counters per partition, one map-side pass, tiny
  * binary merges, no shuffle of the raw term stream.
  *
  * Guarantees (Misra-Gries, and the Agarwal et al. mergeable-summary
  * merge): every reported count is an UNDER-estimate by at most
  * n/ (capacity+1) over the aggregated stream of n items, and any
  * item with true frequency > n/(capacity+1) is guaranteed present
  * in the summary. Counts (not membership) depend on arrival/merge
  * order — sketch outputs are bounds, not exact tallies; pair with
  * an exact pass keyed on the survivors when exact counts matter.
  */
case class ApproxTopKSummary(child: Expression, k: Int, capacity: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k >= 1 && capacity >= k,
    s"need capacity >= k >= 1, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("min_count", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"approx_topk expects a string column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** Classic MG step: count if tracked or space free, else decrement
    * every counter (dropping zeros) — each decrement "spends" one of
    * at most n/(capacity+1) possible epochs, which is the error
    * bound. */
  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val term = v.asInstanceOf[UTF8String]
    buf.get(term) match {
      case Some(c) => buf.update(term, c + 1)
      case None if buf.size < capacity => buf.update(term.clone(), 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (t, c) => if (c == 0) dead += t }
        dead.foreach(buf.remove)
    }
    buf
  }

  /** Mergeable-summary merge: add counts, then shrink back to
    * `capacity` by subtracting the (capacity+1)-largest count from
    * everything (equivalent to that many decrement epochs — the
    * combined error stays ≤ n_total/(capacity+1)). */
  override def merge(a: mutable.HashMap[UTF8String, Long],
                     b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > capacity) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(a.size - capacity - 1) // (capacity+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(a.remove)
    }
    a
  }

  /** Top-k of the surviving counters, count-desc then term-asc so
    * the output ordering is a function of the summary alone. */
  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val top = buf.toArray
      .sortWith((x, y) =>
        x._2 > y._2 || (x._2 == y._2 && x._1.compareTo(y._1) < 0))
      .take(k)
      .map { case (t, c) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](t, c))
      }
    new GenericArrayData(top.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopKSummary =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopKSummary =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApproxTopKSummary =
    copy(child = newChildren.head)
}

object ApproxTopKAggregate {
  /** Approximate top-k frequent values of a string column:
    * array<struct<term, min_count>>, count-desc. `capacity` counters
    * are kept per partial (default 8×k — error ≤ n/(8k+1)). */
  def approxTopK(c: Column, k: Int, capacity: Int = 0): Column = {
    val cap = if (capacity > 0) capacity else 8 * k
    GraftColumnShim.column(ApproxTopKSummary(
      GraftColumnShim.expression(c), k, cap).toAggregateExpression())
  }
}

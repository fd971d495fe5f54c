package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Exact top-k payloads per group, ordered by (score DESC, payload
  * ASC), as a TypedImperativeAggregate.
  *
  * The scale rationale vs the rank-window form (q19): an aggregate
  * participates in PARTIAL aggregation, so each map task reduces its
  * input to at most k rows of state before the shuffle — the window
  * form (even with Spark's WindowGroupLimit pushdown) still shuffles
  * every surviving row to sort it. For top-k over a billion rows per
  * group, the aggregate moves k values per task; the window moves the
  * group.
  *
  * Top-k is closed under merge (keeping the best k of a union equals
  * keeping the best k of each side's best k), so buffers truncate
  * eagerly and state is O(k).
  */
case class TopKByLong(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, payload)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && payload.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"topk_by needs (double, bigint), got " +
        s"(${score.dataType.simpleString}, ${payload.dataType.simpleString})")

  /** (score DESC, payload ASC) with java.lang.Double.compare semantics,
    * so NaN ranks greatest — matching Spark's descending sort and
    * DuckDB's ORDER BY ... DESC (scala's sortBy(-s) would flip NaN to
    * the bottom, diverging from the rank-window form).
    */
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def compact(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (buf.length > k) {
      val kept = buf.sorted(ord).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      buf += ((s.asInstanceOf[Double], p.asInstanceOf[Long]))
      // amortized truncation: let the buffer grow to 4k before sorting
      if (buf.length >= 4 * k) compact(buf)
    }
    buf
  }

  override def merge(b1: ArrayBuffer[(Double, Long)], b2: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    compact(b1 ++= b2)

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.sorted(ord).take(k).map(_._2).toArray)

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    compact(buf)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, p) => out.writeDouble(s); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), payload = newChildren(1))
}

object TopKByLong {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: array of the k payloads with the highest scores,
    * ties broken by smaller payload. score: double, payload: bigint.
    */
  def topk_by(score: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByLong(ColumnBridge.expression(score), ColumnBridge.expression(payload), k)
        .toAggregateExpression())
}

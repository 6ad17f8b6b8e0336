package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra-Gries heavy-hitters summary (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012): the approximate
  * top-k aggregate for corpus-scale term statistics.
  *
  * Why it exists: the exact top-terms queries shuffle one row per
  * DISTINCT term — correct, but at 100 TB the distinct-term set is itself
  * huge (hapax typos, URLs, numbers), and a trainer dashboard usually
  * wants "the heaviest few hundred" rather than the full histogram. The
  * MG summary caps the state at `capacity` entries per partition: partial
  * summaries combine map-side, `capacity` rows per partition cross the
  * shuffle, and the result carries the classic guarantee — every term
  * with true frequency > N/(capacity+1) is PRESENT, and each reported
  * estimate undercounts by at most N/(capacity+1) (N = total tokens).
  * Estimates depend on encounter order, so the operator is spec-gated
  * (LmSpec-style reference sweep) rather than hash-oracled.
  *
  * Output: array<struct<term, cnt_est>> of the `k` heaviest summary
  * entries (cnt_est desc, term asc — deterministic given the summary).
  */
case class MgTopKAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"k must be >= 1, got $k")
  require(capacity >= k, s"capacity ($capacity) must be >= k ($k)")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val term = v.asInstanceOf[UTF8String].toString
    buf.get(term) match {
      case Some(c) => buf.update(term, c + 1)
      case None if buf.size < capacity => buf.update(term, 1L)
      case None =>
        // decrement-all step: drop one count from every tracked term
        // (and, virtually, from the new arrival) — O(capacity), amortized
        // O(1) per decremented unit
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { t =>
          val c = buf(t) - 1
          if (c == 0) dead += t else buf.update(t, c)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  /** Mergeable-summaries rule: add counts, then if over capacity subtract
    * the (capacity+1)-th largest count from everything and drop the
    * non-positive — keeps the error bound additive across partitions. */
  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > capacity) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val dead = a.collect { case (t, c) if c - cut <= 0 => t }.toSeq
      dead.foreach(a.remove)
      a.keysIterator.toSeq.foreach(t => a.update(t, a(t) - cut))
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
    new GenericArrayData(top.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val tb = new Array[Byte](len)
      in.readFully(tb)
      buf.update(new String(tb, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt_est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(o: Int): MgTopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgTopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MgTopKAgg = copy(child = c.head)
}

object TopK {
  /** Approximate top-k heavy hitters of a string column as an aggregate
    * Column: array<struct<term, cnt_est>>, guarantee per [[MgTopKAgg]]. */
  def mg_top_k(c: Column, k: Int, capacity: Int): Column =
    columnOf(MgTopKAgg(exprOf(c), k, capacity)
      .toAggregateExpression(isDistinct = false))
}

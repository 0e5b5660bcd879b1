package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra-Gries heavy hitters as a native TypedImperativeAggregate —
 * the aggregate counterpart of the native scalar expressions: no
 * Dataset-encoder boundary, explicit binary state serialization, and
 * partial aggregation/merge handled by Spark's agg machinery.
 *
 * Semantics are identical to graft.functions.Aggregators.HeavyHitters
 * (which stays as the documented Aggregator-tier example): tokens with
 * frequency > n/k are guaranteed present, state is at most k counters
 * regardless of input size, and buffers merge by replaying counts —
 * the one-pass hot-vocabulary sketch for any corpus size.
 *
 * Output: array<struct<token string, count bigint>> sorted by
 * (count desc, token asc) — deterministic given the final counter set.
 */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType), StructField("count", LongType))),
    containsNull = false)
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty

  private def addCount(acc: mutable.HashMap[UTF8String, Long], item: UTF8String, w: Long): Unit =
    acc.get(item) match {
      case Some(c) => acc.update(item, c + w)
      case None if acc.size < k => acc.update(item.clone(), w)
      case None =>
        val dec = math.min(w, acc.values.min)
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        for ((t, c) <- acc) { if (c - dec > 0) acc.update(t, c - dec) else dead += t }
        dead.foreach(acc.remove)
        if (w - dec > 0) acc.update(item.clone(), w - dec)
    }

  override def update(buffer: mutable.HashMap[UTF8String, Long], input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) addCount(buffer, v.asInstanceOf[UTF8String], 1L)
    buffer
  }

  override def merge(buffer: mutable.HashMap[UTF8String, Long], other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    for ((t, w) <- other) addCount(buffer, t, w)
    buffer
  }

  override def eval(buffer: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buffer.toSeq.sortBy { case (t, c) => (-c, t.toString) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(t, c)
    }.toArray[Any])
  }

  override def serialize(buffer: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    for ((t, c) <- buffer) {
      val bytes = t.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val acc = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      acc.update(UTF8String.fromBytes(bytes), in.readLong())
      i += 1
    }
    acc
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
}

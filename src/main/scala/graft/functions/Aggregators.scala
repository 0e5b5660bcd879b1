package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Custom typed aggregators (the TypedColumn/Aggregator extension tier):
 * mergeable sketches with bounded state, usable from `agg(...)` and
 * registerable as UDAFs via `functions.udaf`.
 */
object Aggregators {

  /**
   * Misra-Gries heavy hitters: tokens occurring more than n/k times are
   * guaranteed to be in the result (with undercounted frequencies).
   * State is k counters regardless of stream length — the sketch that
   * finds hot vocabulary / hot keys in one pass over 100 TB without a
   * full groupBy.
   */
  final class HeavyHitters(k: Int)
      extends Aggregator[String, scala.collection.mutable.HashMap[String, Long], Seq[(String, Long)]] {
    type Buf = scala.collection.mutable.HashMap[String, Long]

    override def zero: Buf = scala.collection.mutable.HashMap.empty

    override def reduce(acc: Buf, item: String): Buf = addCount(acc, item, 1L)

    // mutates in place: the immutable-Map formulation rebuilt the whole
    // counter table on every decrement row (O(rows × k) allocation)
    private def addCount(acc: Buf, item: String, w: Long): Buf = {
      acc.get(item) match {
        case Some(c) => acc.update(item, c + w)
        case None if acc.size < k => acc.update(item, w)
        case None =>
          val dec = math.min(w, acc.values.min)
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          for ((t, c) <- acc) { if (c - dec > 0) acc.update(t, c - dec) else dead += t }
          dead.foreach(acc.remove)
          if (w - dec > 0) acc.update(item, w - dec)
      }
      acc
    }

    override def merge(a: Buf, b: Buf): Buf = {
      for ((item, w) <- b) addCount(a, item, w)
      a
    }

    override def finish(acc: Buf): Seq[(String, Long)] =
      acc.toSeq.sortBy { case (t, c) => (-c, t) }

    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  /**
   * MinHash union: merges per-document signatures into one signature
   * for a whole group (elementwise min — minhash is a mergeable
   * sketch), so similarity BETWEEN GROUPS (sources, domains, shards)
   * costs one aggregation, not a cross-document comparison.
   */
  final class MinHashUnion(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

    override def reduce(acc: Array[Long], sig: Seq[Long]): Array[Long] = {
      var i = 0
      while (i < k && i < sig.length) { if (sig(i) < acc(i)) acc(i) = sig(i); i += 1 }
      acc
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(acc: Array[Long]): Seq[Long] = acc.toSeq

    override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}

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
  final class HeavyHitters(k: Int) extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(acc: Map[String, Long], item: String): Map[String, Long] =
      addCount(acc, item, 1L)

    private def addCount(acc: Map[String, Long], item: String, w: Long): Map[String, Long] = {
      if (acc.contains(item)) acc.updated(item, acc(item) + w)
      else if (acc.size < k) acc.updated(item, w)
      else {
        // decrement all by the new item's weight; drop non-positive
        val dec = math.min(w, acc.values.min)
        val cut = acc.view.mapValues(_ - dec).filter(_._2 > 0).toMap
        if (w - dec > 0) cut.updated(item, w - dec) else cut
      }
    }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (acc, (item, w)) => addCount(acc, item, w) }

    override def finish(acc: Map[String, Long]): Seq[(String, Long)] =
      acc.toSeq.sortBy { case (t, c) => (-c, t) }

    override def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
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

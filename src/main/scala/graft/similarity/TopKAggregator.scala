package graft.similarity

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Bounded top-k as a typed Aggregator (SURVEY §7.4.5's "bounded
 * priority queue" slot): keeps at most k (score, id) pairs ordered by
 * (score desc, id asc).
 *
 * Why this beats a rank window at scale: a window top-k must shuffle
 * EVERY scored row to the group's partition before ranking; an
 * aggregate does partial top-k map-side, so only k rows per partition
 * per group reach the exchange. For ANN over 10⁹ candidates × q
 * queries that's the difference between shuffling 10⁹·q rows and
 * k·partitions·q.
 */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k) (buf :+ a).sorted(ord)
    else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
    else buf

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (x ++ y).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}

object TopKAggregator {
  /** Untyped column form: `topK(5)(col("score"), col("id"))` →
    * array<struct<_1: double, _2: bigint>> of the top k. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    (score, id) => fn(score, id)
  }
}

package graft.similarity

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Mutable bounded top-k buffer: a binary heap with the WORST kept
 * element at the root (lowest score, then highest id), so the
 * replacement test against a new candidate is O(1) and an accepted
 * candidate costs one O(log k) sift. Plain primitive arrays — no
 * boxing in the hot loop.
 */
final class TopKHeap(val k: Int) extends Serializable {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  /** (sa, ia) ranks worse than (sb, ib): lower score, then higher id —
    * the inverse of the output ordering (score desc, id asc). */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  @inline private def worseAt(i: Int, j: Int): Boolean =
    worse(scores(i), ids(i), scores(j), ids(j))

  @inline private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(from: Int): Unit = {
    var i = from
    while (i > 0 && worseAt(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < size && worseAt(l, w)) w = l
      if (r < size && worseAt(r, w)) w = r
      if (w == i) done = true else { swap(i, w); i = w }
    }
  }

  /** Offer a candidate: inserted while under capacity, else replaces
    * the root iff it beats the current worst. */
  def add(s: Double, id: Long): Unit =
    if (size < k) {
      scores(size) = s; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown()
    }

  /** Drain the other heap into this one. */
  def absorb(other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { add(other.scores(i), other.ids(i)); i += 1 }
    this
  }

  /** Best-first (score desc, id asc) — the output contract. */
  def toSortedSeq: Seq[(Double, Long)] =
    Seq.tabulate(size)(i => (scores(i), ids(i)))
      .sortBy { case (s, id) => (-s, id) }
}

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
 *
 * The buffer is a [[TopKHeap]] behind a kryo encoder: Spark's object
 * hash aggregation keeps it as a live JVM object between `reduce`
 * calls, so per-candidate cost is O(1) rejected / O(log k) accepted —
 * serialization only happens at the partial/final exchange.
 */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), TopKHeap, Seq[(Double, Long)]] {

  override def zero: TopKHeap = new TopKHeap(k)

  override def reduce(buf: TopKHeap, a: (Double, Long)): TopKHeap = {
    buf.add(a._1, a._2)
    buf
  }

  override def merge(x: TopKHeap, y: TopKHeap): TopKHeap =
    if (x.size >= y.size) x.absorb(y) else y.absorb(x)

  override def finish(buf: TopKHeap): Seq[(Double, Long)] = buf.toSortedSeq

  override def bufferEncoder: Encoder[TopKHeap] = Encoders.kryo[TopKHeap]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
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

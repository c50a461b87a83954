package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Distributed frequency estimation: exact heavy hitters at stream
 * scale via per-partition Misra–Gries summaries.
 *
 * The naive exact plan (`groupBy(item).count()` over every item) is
 * correct but shuffles the full item-grain table — at 100 TB of
 * tokens that exchange IS the job. Misra–Gries turns it into a
 * two-pass plan where the raw items NEVER shuffle:
 *
 *  1. Each partition folds its item stream through k counters
 *     (`mapPartitions`, O(k) memory, amortized O(1) per item: every
 *     decrement-all step retires k+1 units of count mass, so total
 *     decrement work is ≤ n/(k+1) · k < n). The partition emits at
 *     most k `(item, weight)` rows — the only data that crosses the
 *     wire, k · numPartitions rows total regardless of data volume.
 *  2. The summed summaries form the CANDIDATE set. The classic MG
 *     bound per partition p — c_p(t) ≥ f_p(t) − d_p with total
 *     decrements d_p ≤ n_p/(k+1) — sums across partitions to
 *     Σc_p(t) ≥ f(t) − n/(k+1), so every item with global frequency
 *     f(t) > n/(k+1) survives in at least one summary: candidates ⊇
 *     true heavy hitters, unconditionally, for ANY partitioning and
 *     ANY within-partition order.
 *  3. A second scan counts ONLY candidate items exactly (broadcast
 *     semi-join on the tiny candidate set; map-side partial
 *     aggregation collapses each partition to ≤ |candidates| rows
 *     before the exchange) and keeps those strictly above n/(k+1).
 *
 * The output is therefore EXACT — identical to the full groupBy —
 * while the summary stage is the only thing that ever sees the
 * non-candidate long tail. The oracle is the plain exact SQL; the
 * partition-order-dependence of MG is confined to the candidate set,
 * which the superset guarantee makes invisible in the result
 * (FrequencySpec pins this under adversarial partitionings).
 */
object Frequency {

  /**
   * Per-partition Misra–Gries summaries, summed: one row per
   * surviving candidate item with its summed lower-bound weight.
   * At most k rows leave each partition.
   */
  def misraGriesCandidates(items: Dataset[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1L)
          case None if counters.size < k => counters.update(t, 1L)
          case None =>
            // decrement-all: retires k+1 units of count mass (the k
            // counters and the incoming item), keys at zero drop out
            val dead = List.newBuilder[String]
            counters.keysIterator.foreach { key =>
              val c = counters(key) - 1L
              if (c == 0L) dead += key else counters.update(key, c)
            }
            dead.result().foreach(counters.remove)
        }
      }
      counters.iterator.map { case (t, c) => (t, c) }
    }.toDF("item", "weight")
      .groupBy(col("item")).agg(sum(col("weight")).as("weight"))
  }

  /**
   * Heavy-hitter report over a COMPLETE (item, cnt) counts frame —
   * the read-time view a streaming twin derives from its maintained
   * counters (counts are fold-order-free, so any micro-batch split
   * drains to the batch aggregate). The total is the sum of the
   * counts themselves, so the frame must cover every item; the
   * threshold/share math is shared verbatim with
   * [[exactHeavyHitters]]'s final filter.
   */
  def heavyHittersFromCounts(counts: DataFrame, k: Int): DataFrame = {
    val totals = counts.agg(sum(col("cnt")).as("__n"))
    counts.crossJoin(broadcast(totals))
      .filter(col("cnt") * lit(k + 1L) > col("__n"))
      .select(col("item"), col("cnt"),
        expr("cnt * 1000000 div __n").as("share_ppm"))
  }

  /**
   * Exact heavy hitters: every item with frequency strictly above
   * n/(k+1), with its exact count and floor-scaled parts-per-million
   * share — via the MG candidate pass above, so the raw item stream
   * never shuffles. `items` is scanned twice (summary + exact pass);
   * at scale the caller persists or re-reads the columnar source,
   * both scans project a single column.
   */
  def exactHeavyHitters(items: Dataset[String], k: Int): DataFrame = {
    val tok = items.toDF("item")
    val cands = misraGriesCandidates(items, k).select("item")
    val totals = tok.agg(count(lit(1)).as("__n"))
    tok.join(broadcast(cands), Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(totals))
      .filter(col("cnt") * lit(k + 1L) > col("__n"))
      .select(col("item"), col("cnt"),
        expr("cnt * 1000000 div __n").as("share_ppm"))
  }
}

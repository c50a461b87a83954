package graft.quality

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class QsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def hash(k: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"qs:$k".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.substring(0, 13), 16)
  }

  test("column pipeline reproduces the reference 52-bit row hash") {
    val rnd = new scala.util.Random(11)
    val keys = Seq.fill(500)(rnd.nextLong())
    val got = keys.toDF("k").select(Qs.hashOf(col("k")).as("v"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == keys.map(hash))
  }

  test("min-union: bottom-K of a union equals bottom-K of the shard bottom-Ks") {
    // row identity keys are unique across shards (they are row ids),
    // so no distinct step is needed — plain min-union of the kept sets
    val rnd = new scala.util.Random(23)
    val shards = Seq.fill(5)(Seq.fill(400)(rnd.nextLong()).distinct)
    val all = shards.flatten
    assume(all.distinct.size == all.size) // unique row keys by draw
    def bottomK(ks: Seq[Long]): Seq[Long] = ks.map(hash).sorted.take(Qs.K)
    val merged = shards.flatMap(bottomK).sorted.take(Qs.K)
    assert(merged == bottomK(all),
      "the merged signature must equal the direct global signature")
  }

  test("sample quantile lands within the rank bound on a big skewed draw") {
    // lognormal-ish values keyed by sequential row ids — the hash draw
    // is FIXED, so this is a deterministic regression pin of the
    // bound, not a flaky statistical test
    val n = 50000
    val rnd = new scala.util.Random(47)
    val rows = (1L to n.toLong).map(k => (k, math.exp(rnd.nextGaussian())))
    val sample = rows.sortBy { case (k, _) => (hash(k), k) }.take(Qs.K)
    val byValue = sample.map(_._2).sorted
    val values = rows.map(_._2).sorted
    for (q <- Qs.Quantiles) {
      val est = byValue(math.ceil(q * Qs.K).toInt - 1)
      val exactRank = values.count(_ <= est).toDouble / n
      val bound = 3.5 * math.sqrt(q * (1 - q) / Qs.K) + 1.0 / Qs.K
      assert(math.abs(exactRank - q) <= bound,
        s"q=$q: exact rank $exactRank outside bound $bound")
    }
  }

  test("unsaturated sample: the quantile pick is the exact order statistic") {
    // n < K means the signature IS the whole table — ceil(q*k_used)
    // indexes the true sorted data, so the estimate is exact
    val n = 40
    val rows = (1L to n.toLong).map(k => (k, (k * 37 % 100).toDouble))
    val sample = rows.sortBy { case (k, _) => (hash(k), k) }.take(Qs.K)
    assert(sample.size == n && n < Qs.K)
    val byValue = sample.map(_._2).sorted
    val values = rows.map(_._2).sorted
    for (q <- Qs.Quantiles) {
      val est = byValue(math.ceil(q * n).toInt - 1)
      assert(est == values(math.ceil(q * n).toInt - 1),
        s"q=$q: unsaturated pick must be the exact order statistic")
    }
  }

  test("rank bound expression matches its SQL rendering") {
    val q = 0.9
    val viaColumn = Seq(q).toDF("q")
      .select(Qs.rankBound(col("q"))).collect().head.getDouble(0)
    val expected = 3.5 * math.sqrt(q * (1.0 - q) / Qs.K) + 1.0 / Qs.K
    assert(viaColumn == expected)
    // the SQL rendering carries the same power-of-two addend literal
    assert(Qs.rankBoundSql("q").endsWith((1.0 / Qs.K).toString))
  }
}

package graft.quality

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class KmvSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def hash(k: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"kmv:$k".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.substring(0, 13), 16)
  }

  private def bottomK(keys: Set[Long]): Seq[Long] =
    keys.toSeq.map(hash).sorted.take(Kmv.K)

  test("column pipeline reproduces the reference 52-bit hash values") {
    val rnd = new scala.util.Random(7)
    val keys = Seq.fill(500)(rnd.nextLong())
    val got = keys.toDF("k").select(Kmv.valueOf(col("k")).as("v"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == keys.map(hash))
  }

  test("min-union of two signatures equals the signature of the union") {
    val rnd = new scala.util.Random(19)
    val a = Seq.fill(300)(rnd.nextLong()).toSet
    val b = Seq.fill(300)(rnd.nextLong()).toSet
    val merged = (bottomK(a) ++ bottomK(b)).distinct.sorted.take(Kmv.K)
    assert(merged == bottomK(a ++ b),
      "a union signature must be recoverable from the two shard signatures")
  }

  test("union estimate lands within 3 rse of the true cardinality") {
    // rse ~ 1/sqrt(k-2) for the (k-1)/kth estimator
    val rnd = new scala.util.Random(31)
    val keys = Seq.fill(5000)(rnd.nextLong()).toSet
    val kth = bottomK(keys).last
    val est = Kmv.EstimatorConst / kth.toDouble
    val rse = 1.0 / math.sqrt(Kmv.K - 2.0)
    assert(math.abs(est - keys.size) <= 3 * rse * keys.size,
      s"estimate $est vs exact ${keys.size}")
  }

  test("estimator constant round-trips through its SQL literal") {
    assert(Kmv.EstimatorConstLiteral.toDouble == Kmv.EstimatorConst)
  }

  test("unsaturated signature: the estimate IS k_used, exactly") {
    // 7 + 9 keys with 3 shared: |A ∪ B| = 13 < K, so the union
    // signature is the whole hashed set and extrapolating from the
    // 13th-smallest value would misestimate badly — the (K-1)·2^52/kth
    // formula here yields ~nonsense (kth is just the max of a tiny
    // set). The estimator must return k_used, which equals the exact
    // union cardinality.
    val a = (1L to 7L).toSet
    val b = (5L to 13L).toSet
    val unionSig = (bottomK(a) ++ bottomK(b)).distinct.sorted.take(Kmv.K)
    assert(unionSig.size == 13 && unionSig.size < Kmv.K)
    val row = Seq((unionSig.size.toLong, unionSig.last)).toDF("k_used", "kth")
      .select(Kmv.unionEstimate(col("k_used"), col("kth")).as("est"),
        (lit(Kmv.EstimatorConst) / col("kth").cast("double")).as("raw"))
      .collect().head
    assert(row.getDouble(0) == 13.0)
    // and the naive formula would indeed NOT have been close
    assert(math.abs(row.getDouble(1) - 13.0) > 13.0 * 0.5,
      "fixture too kind: the naive formula happened to land close, " +
        "pick different keys so the regression stays visible")
    // saturated branch unchanged: k_used == K falls through to
    // (K-1)·2^52/kth
    val sat = Seq((Kmv.K.toLong, 1L << 47)).toDF("k_used", "kth")
      .select(Kmv.unionEstimate(col("k_used"), col("kth"))).collect().head
    assert(sat.getDouble(0) == Kmv.EstimatorConst / (1L << 47).toDouble)
  }
}

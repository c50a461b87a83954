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
}

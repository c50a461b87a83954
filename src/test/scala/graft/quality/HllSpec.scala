package graft.quality

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class HllSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  /** Reference implementation straight from the hash-layout contract:
    * md5 via MessageDigest, leading zeros via BigInt.bitLength. */
  private def reference(keys: Seq[Long]): Map[Int, Int] = {
    val regs = scala.collection.mutable.Map.empty[Int, Int]
    keys.foreach { k =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"hll:$k".getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      val bucket = Integer.parseInt(hex.substring(0, 2), 16)
      val tail = BigInt(hex.substring(2, 15), 16)
      val rank = if (tail == 0) Hll.RankCap else 52 - tail.bitLength + 1
      regs(bucket) = math.max(regs.getOrElse(bucket, 0), rank)
    }
    regs.toMap
  }

  test("column pipeline reproduces the reference registers on random keys") {
    val keys = {
      val rnd = new scala.util.Random(3)
      Seq.fill(2000)(rnd.nextLong())
    }
    val got = keys.toDF("k")
      .select(Hll.hashHex(col("k")).as("h"))
      .select(Hll.bucketOf(col("h")).as("bucket"), Hll.rankOf(col("h")).as("rank"))
      .groupBy("bucket").agg(max("rank").as("r"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got == reference(keys))
  }

  test("rankSql renders the identical ranks through the SQL engine") {
    val keys = (1L to 500L).toSeq
    keys.toDF("k").select(Hll.hashHex(col("k")).as("h"))
      .createOrReplaceTempView("hashed")
    // bucket extraction differs by dialect ('0x' cast is DuckDB-only;
    // Spark spells it conv) — rankSql is the shared-portable piece
    val viaSql = spark.sql(
        s"SELECT CAST(conv(substr(h, 1, 2), 16, 10) AS INT) AS bucket, " +
          s"${Hll.rankSql("h")} AS rank FROM hashed")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    val viaCols = keys.toDF("k").select(Hll.hashHex(col("k")).as("h"))
      .select(Hll.bucketOf(col("h")), Hll.rankOf(col("h")))
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(viaSql.toSeq == viaCols.toSeq)
  }

  test("register-max merge over any sharding equals the direct registers") {
    val rnd = new scala.util.Random(9)
    val keyed = Seq.fill(3000)((rnd.nextLong(), rnd.nextInt(7))).toDF("k", "shard")
      .select(col("shard"), Hll.hashHex(col("k")).as("h"))
      .select(col("shard"), Hll.bucketOf(col("h")).as("bucket"),
        Hll.rankOf(col("h")).as("rank"))
    val direct = keyed.groupBy("bucket").agg(max("rank").as("r"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val merged = keyed.groupBy("shard", "bucket").agg(max("rank").as("r"))
      .groupBy("bucket").agg(max("r").as("r"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(merged == direct)
  }

  test("estimator constants round-trip through their SQL literals") {
    assert(Hll.EstimatorConstLiteral.toDouble == Hll.EstimatorConst)
    assert(Hll.Bound3RsdLiteral.toDouble == Hll.Bound3Rsd)
  }

  test("estimate lands within 3 rsd of the true cardinality") {
    val rnd = new scala.util.Random(17)
    val keys = Seq.fill(8000)(rnd.nextLong()).distinct
    val regs = reference(keys)
    val s = (0 until Hll.M)
      .map(b => 1L << (Hll.RankCap - regs.getOrElse(b, 0))).sum
    val est = Hll.EstimatorConst / s.toDouble
    assert(math.abs(est - keys.size) <= Hll.Bound3Rsd * keys.size,
      s"estimate $est vs exact ${keys.size}")
  }
}

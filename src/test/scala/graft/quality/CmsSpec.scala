package graft.quality

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CmsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  /** Counter matrix straight from the hash contract (MessageDigest). */
  private def reference(keys: Seq[Long]): Map[(Int, Int), Long] = {
    val m = scala.collection.mutable.Map.empty[(Int, Int), Long]
      .withDefaultValue(0L)
    for (k <- keys; r <- 0 until Cms.D) {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cms:$r:$k".getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      val c = Integer.parseInt(hex.substring(0, 4), 16) % Cms.W
      m((r, c)) += 1L
    }
    m.toMap
  }

  private def sketch(keys: Seq[Long]): Map[(Int, Int), Long] =
    keys.toDF("k")
      .select(col("k"), explode(array((0 until Cms.D).map(lit(_)): _*)).as("r"))
      .withColumn("c", Cms.colOf(col("r"), col("k")))
      .groupBy("r", "c").agg(count(lit(1)).as("n"))
      .collect().map(x => (x.getInt(0), x.getInt(1)) -> x.getLong(2)).toMap

  test("column pipeline reproduces the reference counter matrix") {
    val rnd = new scala.util.Random(5)
    val keys = Seq.fill(3000)(rnd.nextInt(200).toLong)
    assert(sketch(keys) == reference(keys))
  }

  test("cell-wise SUM merge over any sharding equals the direct counters") {
    val rnd = new scala.util.Random(13)
    val shards = Seq.fill(5)(Seq.fill(600)(rnd.nextInt(100).toLong))
    val merged = shards.map(sketch).foldLeft(
        Map.empty[(Int, Int), Long].withDefaultValue(0L)) { (acc, s) =>
      s.foldLeft(acc) { case (a, (cell, n)) => a.updated(cell, a(cell) + n) }
    }
    assert(merged.filter(_._2 > 0) == sketch(shards.flatten))
  }

  test("point estimates are one-sided: min across rows never undercounts") {
    val rnd = new scala.util.Random(23)
    val keys = Seq.fill(4000)(rnd.nextInt(300).toLong)
    val counters = reference(keys)
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong)
    truth.foreach { case (k, n) =>
      val est = (0 until Cms.D).map { r =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"cms:$r:$k".getBytes("UTF-8"))
        val hex = d.map("%02x".format(_)).mkString
        counters.getOrElse((r, Integer.parseInt(hex.substring(0, 4), 16) % Cms.W), 0L)
      }.min
      assert(est >= n, s"key $k: estimate $est under true count $n")
    }
  }
}

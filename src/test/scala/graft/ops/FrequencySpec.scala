package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Misra–Gries exact heavy hitters: the candidate stage may vary with
  * partitioning, but the RESULT must not — and must equal the naive
  * exact groupBy at every partitioning, including adversarial ones. */
class FrequencySpec extends AnyFunSuite with SparkSpec {

  private def exactReference(items: Seq[String], k: Int): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      .filter { case (_, c) => c * (k + 1) > n }
  }

  private def run(items: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    val ds = spark.createDataset(items).repartition(parts)
    Frequency.exactHeavyHitters(ds, k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("equals the exact groupBy under every partitioning") {
    // a Zipf-ish stream: 'a' 40%, 'b' 20%, tail of singletons
    val items = Seq.fill(400)("a") ++ Seq.fill(200)("b") ++
      Seq.fill(80)("c") ++ (0 until 320).map(i => s"t$i")
    val want = exactReference(items, 7)
    assert(want.contains("a") && want.contains("b"))
    assert(!want.contains("c"), "c is 8% — below the n/8 threshold")
    for (parts <- Seq(1, 3, 32)) {
      assert(run(items, 7, parts) === want, s"parts=$parts")
    }
    // adversarial: all heavy-hitter mass packed into one partition,
    // every other partition pure tail — candidates must still surface
    import spark.implicits._
    val packed = spark.createDataset(items.sorted).repartitionByRange(8, col("value"))
    val got = Frequency.exactHeavyHitters(packed, 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want, "range-packed partitioning")
  }

  test("candidate set is a superset of true heavy hitters; at most k rows per partition") {
    import spark.implicits._
    val items = Seq.fill(100)("x") ++ (0 until 900).map(i => s"n${i % 450}")
    val ds = spark.createDataset(items).repartition(5)
    val cands = Frequency.misraGriesCandidates(ds, 9)
      .select("item").as[String].collect().toSet
    assert(cands.contains("x"), "10% item must survive k=9 (threshold n/10)")
    // per-partition emission bound: <= k rows each
    val perPart = ds.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(cands.size <= 9 * perPart.length)
  }

  test("threshold boundary is strict and k=1 degenerates to the majority item") {
    // exactly half is NOT a heavy hitter for k=1 (needs > n/2)
    val even = Seq.fill(50)("a") ++ Seq.fill(50)("b")
    assert(run(even, 1, 4) === Map.empty)
    val maj = Seq.fill(51)("a") ++ Seq.fill(49)("b")
    assert(run(maj, 1, 4) === Map("a" -> 51L))
  }
}

package graft.marketpulse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Property tests for the merge algebra and flatten conservation
 * (SURVEY §5.3): random document version sets with overlapping dates,
 * zeros, and empty series, driven by explicit ScalaCheck seeds so every
 * run covers the same cases plus reproducible failures.
 */
class MergeLawsSpec extends AnyFunSuite with SparkSpec {

  private val symbolGen = Gen.oneOf("AAPL", "MSFT", "GOOGL")
  private val dateGen = Gen.choose(1, 28).map(d => f"2025-09-$d%02d")
  private val priceGen = Gen.oneOf("0.0", "1.5", "99.99", "100.0", "12345.67")

  private val docGen: Gen[String] = for {
    sym <- symbolGen
    nDates <- Gen.choose(0, 6)
    dates <- Gen.listOfN(nDates, dateGen).map(_.distinct)
    prices <- Gen.listOfN(dates.size, priceGen)
    refreshDay <- Gen.choose(1, 9)
  } yield Fixtures.doc(sym, s"2025-10-0$refreshDay",
    dates.zip(prices).map { case (d, p) => d -> Fixtures.bar(p, p, p, p, "100") })

  private def sampleDocs(seed: Long, n: Int): Seq[String] =
    Gen.listOfN(n, docGen).pureApply(Gen.Parameters.default, Seed(seed))

  /** Parse docs and attach distinct, order-preserving load_dates —
    * derived from the driver-side index, so no global window is needed. */
  private def versions(docs: Seq[String]): DataFrame = {
    import spark.implicits._
    Ingest.parseDocumentFrame(
      docs.zipWithIndex.toDF("json", "idx"),
      col("json"),
      to_timestamp(concat(lit("2025-10-01 00:00:"),
        lpad((col("idx") % 60).cast("string"), 2, "0"))))
  }

  test("merge conservation: one row per symbol, union of dates preserved") {
    for (seed <- 1L to 15L) {
      val v = versions(sampleDocs(seed, 4))
      val merged = DocumentMerge.mergeIncremental(v)
      assert(merged.groupBy("symbol").count().filter(col("count") > 1).count() == 0,
        s"seed=$seed: duplicate symbols")
      val inputDates = Staging.stgAlphavantage(v)
        .select("symbol", "trading_date").distinct().count()
      val outputDates = Staging.stgAlphavantage(merged)
        .select("symbol", "trading_date").distinct().count()
      assert(inputDates == outputDates, s"seed=$seed: dates lost or invented")
    }
  }

  test("merge idempotence: merge(merge(V)) == merge(V)") {
    for (seed <- 20L to 29L) {
      val v = versions(sampleDocs(seed, 3))
      val once = DocumentMerge.mergeIncremental(v)
      val twice = DocumentMerge.mergeIncremental(once)
      val a = Staging.stgAlphavantage(once).orderBy("symbol", "trading_date").collect().toSeq
      val b = Staging.stgAlphavantage(twice).orderBy("symbol", "trading_date").collect().toSeq
      assert(a == b, s"seed=$seed")
    }
  }

  test("flatten conservation: staging rows == sum of series sizes") {
    for (seed <- 30L to 39L) {
      val raw = Ingest.parseDocuments(spark, sampleDocs(seed, 3))
      val expected = raw
        .select(size(col("data").getField(Schemas.SeriesKey)).as("n"))
        .agg(coalesce(sum(col("n")), lit(0L))).collect().head.getLong(0)
      assert(Staging.stgAlphavantage(raw).count() == expected, s"seed=$seed")
    }
  }
}

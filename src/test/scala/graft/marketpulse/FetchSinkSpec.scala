package graft.marketpulse

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** S1 (pluggable fetch) and S5 (JSON write-back) boundary tests: the
  * two halves that wrap the ingest path the way the reference's DAG
  * wraps it (fetch → land → read; merge → write back). */
class FetchSinkSpec extends AnyFunSuite with SparkSpec {

  test("document write-back: file-per-symbol layout, round-trips through readDocuments") {
    val parsed = Ingest.parseDocuments(spark,
      Seq(Fixtures.aapl, Fixtures.v, Fixtures.brkB))
    val dir = Files.createTempDirectory("graft-docsink").toString
    DocumentSink.writeDocuments(parsed, dir)

    // one pretty-printed file per CANONICAL symbol (get_stock.py:86)
    assert(new java.io.File(dir).list().toSet ==
      Set("AAPL.json", "V.json", "BRK.B.json"))

    val reread = Ingest.readDocuments(spark, dir)
    def meta(df: DataFrame): Map[String, Map[String, String]] =
      df.select(col("symbol"), col("data").getField(Schemas.MetaKey)).collect()
        .map(r => r.getString(0) -> r.getMap[String, String](1).toMap).toMap
    assert(meta(reread) == meta(parsed))

    // the flattened series survives the write→read cycle value-exact
    def staged(df: DataFrame) =
      Staging.stgAlphavantage(df).orderBy("symbol", "trading_date").collect().toSeq
    assert(staged(reread) == staged(parsed))
  }

  test("reference DAG: fetch → merge with landed state → write-back → models, idempotent") {
    val root = Files.createTempDirectory("graft-dag-").toString + "/alphavantage"

    // cycle 1: first fetch lands and models derive from it
    val run1 = Pipeline.referenceDag(spark, Seq("GOOGL"),
      new Fetch.StubFetcher(Map("GOOGL" -> Fixtures.overlapOld)), root)
    assert(run1.staging.count() == 2)
    assert(new java.io.File(s"$root/GOOGL.json").isFile)

    // cycle 2: refetch restates 10-02 and adds 10-03; the landed state
    // supplies 10-01 and loses the restated date to the newer fetch
    val run2 = Pipeline.referenceDag(spark, Seq("GOOGL"),
      new Fetch.StubFetcher(Map("GOOGL" -> Fixtures.overlapNew)), root)
    val stg2 = run2.staging.orderBy("trading_date").collect()
    assert(stg2.map(_.get(1).toString).toSeq ==
      Seq("2025-10-01", "2025-10-02", "2025-10-03"))
    assert(stg2(1).getAs[Double]("open") == 99.0) // restated by the refetch

    // cycle 3: the SAME fetch again — a no-op by U2 idempotence
    val run3 = Pipeline.referenceDag(spark, Seq("GOOGL"),
      new Fetch.StubFetcher(Map("GOOGL" -> Fixtures.overlapNew)), root)
    assert(run3.staging.orderBy("trading_date").collect().toSeq == stg2.toSeq)
  }

  test("fetch stage: provider aliases cross the boundary, invalid documents drop") {
    val invalid = """{"Error Message": "rate limit exceeded"}"""
    val stub = new Fetch.StubFetcher(Map(
      "AAPL" -> Fixtures.aapl,
      "BRK-B" -> Fixtures.brkB,
      "V" -> invalid))
    val out = Fetch.fetchDocuments(spark, Seq("AAPL", "BRK.B", "V", "MISSING"), stub)

    // canonical symbols are mapped to their provider form BEFORE the
    // call (get_stock.py:57), in list order
    assert(stub.requested.toSeq == Seq("AAPL", "BRK-B", "V", "MISSING"))

    // V's series-less document fails the validity check and is skipped
    // (get_stock.py:64-68); MISSING returned nothing; the alias comes
    // back canonicalized
    assert(out.select("symbol").collect().map(_.getString(0)).toSet ==
      Set("AAPL", "BRK.B"))
  }
}

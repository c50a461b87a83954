package graft.ops

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TimeSeriesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("gapFill densifies each key's own span, ffills gauges, zero-fills counts") {
    val observed = Seq(
      ("a", d("2024-01-01"), 3L, 10.5),
      ("a", d("2024-01-04"), 1L, 7.0), // 2-day gap before this row
      ("b", d("2024-02-10"), 2L, 99.0)) // single-day key: spine of one
      .toDF("k", "day", "n", "gauge")
    val out = TimeSeries.gapFill(observed, Seq("k"), "day",
        ffillCols = Seq("gauge"), zeroFillCols = Seq("n"))
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Date]("day").toString,
        r.getAs[Long]("n"), r.getAs[Double]("gauge"), r.getAs[Boolean]("is_observed")))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", 3L, 10.5, true),
      ("a", "2024-01-02", 0L, 10.5, false), // gap: count zeroed, gauge carried
      ("a", "2024-01-03", 0L, 10.5, false),
      ("a", "2024-01-04", 1L, 7.0, true),   // new observation replaces the carry
      ("b", "2024-02-10", 2L, 99.0, true))) // no gap to fill
  }

  test("gapFill never crosses keys: a gap in one key ignores another key's values") {
    val observed = Seq(
      ("a", d("2024-01-01"), 1.0),
      ("a", d("2024-01-03"), 2.0),
      ("b", d("2024-01-02"), 777.0)) // inside a's gap, must not leak into a
      .toDF("k", "day", "gauge")
    val out = TimeSeries.gapFill(observed, Seq("k"), "day",
        ffillCols = Seq("gauge"), zeroFillCols = Nil)
      .filter(col("k") === "a" && col("day") === lit(d("2024-01-02")))
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("gauge") == 1.0)
    assert(!out(0).getAs[Boolean]("is_observed"))
  }
}

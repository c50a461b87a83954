package graft.marketpulse

/** Handcrafted provider-document fixtures (FIXTURES.md §A.1): faithful
  * shape — map keyed by date string, all numerics as strings, quoted
  * field names with spaces/dots/digits. */
object Fixtures {

  def bar(open: String, high: String, low: String, close: String, volume: String): String =
    s"""{"1. open": "$open", "2. high": "$high", "3. low": "$low", "4. close": "$close", "5. volume": "$volume"}"""

  def doc(symbol: String, refreshed: String, series: Seq[(String, String)]): String = {
    val seriesJson = series.map { case (d, b) => s""""$d": $b""" }.mkString(",\n    ")
    s"""{
       |  "Meta Data": {
       |    "1. Information": "Daily Prices (open, high, low, close) and Volumes",
       |    "2. Symbol": "$symbol",
       |    "3. Last Refreshed": "$refreshed",
       |    "4. Output Size": "Full size",
       |    "5. Time Zone": "US/Eastern"
       |  },
       |  "Time Series (Daily)": {
       |    $seriesJson
       |  }
       |}""".stripMargin
  }

  /** 10 trading days spanning two ISO weeks (Mon 2025-09-29 … Fri 2025-10-10). */
  val aapl: String = doc("AAPL", "2025-10-10",
    Seq(
      "2025-09-29" -> bar("100.0", "102.0", "99.0", "101.0", "1000"),
      "2025-09-30" -> bar("101.0", "103.0", "100.0", "102.0", "1100"),
      "2025-10-01" -> bar("102.0", "104.0", "101.0", "103.0", "1200"),
      "2025-10-02" -> bar("103.0", "105.0", "102.0", "104.0", "1300"),
      "2025-10-03" -> bar("104.0", "106.0", "103.0", "105.0", "1400"),
      "2025-10-06" -> bar("105.0", "107.0", "104.0", "106.0", "1500"),
      "2025-10-07" -> bar("106.0", "108.0", "105.0", "107.0", "1600"),
      "2025-10-08" -> bar("107.0", "109.0", "106.0", "108.0", "1700"),
      "2025-10-09" -> bar("108.0", "110.0", "107.0", "109.0", "1800"),
      "2025-10-10" -> bar("109.0", "111.0", "108.0", "110.0", "1900")))

  /** V is fetched but unmapped in the dim CASE → 'Unknown Company'/'Other'. */
  val v: String = doc("V", "2025-10-10",
    Seq(
      "2025-10-09" -> bar("250.0", "252.0", "249.0", "251.0", "2000"),
      "2025-10-10" -> bar("251.0", "253.0", "250.0", "252.0", "2100")))

  /** Provider alias form BRK-B; canonical key is BRK.B. */
  val brkB: String = doc("BRK-B", "2025-10-10",
    Seq("2025-10-10" -> bar("400.0", "402.0", "399.0", "401.0", "3000")))

  /** Zero open → percent_change NULL via the NULLIF guard. */
  val zeroOpen: String = doc("ZERO", "2025-10-10",
    Seq("2025-10-10" -> bar("0.0000", "1.0", "0.0", "0.5", "10")))

  /** Empty series → no staging rows (inner flatten). */
  val emptySeries: String = doc("EMPTY", "2025-10-10", Seq.empty).replace(
    "\"Time Series (Daily)\": {\n    \n  }", "\"Time Series (Daily)\": {}")

  /** Overlapping versions of GOOGL: new restates 10-02 and adds 10-03. */
  val overlapOld: String = doc("GOOGL", "2025-10-02",
    Seq(
      "2025-10-01" -> bar("10.0", "11.0", "9.0", "10.5", "100"),
      "2025-10-02" -> bar("10.5", "11.5", "9.5", "11.0", "110")))

  val overlapNew: String = doc("GOOGL", "2025-10-03",
    Seq(
      "2025-10-02" -> bar("99.0", "99.5", "98.0", "99.25", "999"),
      "2025-10-03" -> bar("11.0", "12.0", "10.0", "11.5", "120")))
}

package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Pins tx51's FILTERING SIGNAL on the gate fixture, not merely its
 * engine agreement: an LM-scoring regression that shifted every score
 * uniformly would still gate green (the oracle computes the identical
 * expressions), so this spec asserts the reference-band flag actually
 * discriminates — out-of-reference-language documents are flagged at
 * a far higher rate than reference-language ones, and the en rate is
 * pinned near the 5% the p95 construction implies.
 */
class LmScoreSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def fixtureReady = new java.io.File(dir).isDirectory

  test("tx51: the reference band separates reference from foreign documents") {
    assume(fixtureReady)
    val rows = Registry.byName("tx51_lm_score").run(spark, dir)
      .select("lang", "flagged").collect()
      .map(r => (r.getString(0), r.getBoolean(1)))
    def rate(p: ((String, Boolean)) => Boolean): Double = {
      val s = rows.filter(p); s.count(_._2).toDouble / s.length
    }
    val en = rate(_._1 == "en")
    val foreign = rate(_._1 != "en")
    // p95 construction: just under 5% of en docs sit above their own
    // p95 (ties can only push the rate DOWN); foreign word salad must
    // be flagged at several times that
    assert(en <= 0.05 + 1e-9, s"en flag rate $en exceeds the p95 cut")
    assert(foreign > 3 * en && foreign > 0.2,
      s"band lost its signal: en rate $en vs foreign rate $foreign")
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.Multimodal

/**
 * The construction invariants behind mm21's closed-form oracle,
 * re-derived with the exact machinery rather than asserted from the
 * scaladoc: (1) a rendered pattern PNG decodes to an aHash equal to
 * the pattern bit for bit — the property that turns planted Hamming
 * distances into arithmetic; (2) the full 126-gadget family keeps
 * ≥ 14 bits of cross-gadget separation over EVERY member pair, so no
 * gadget can contaminate another's census at radius 6; (3) the
 * within-gadget census is exactly the five-pairs-one-absence layout
 * the oracle prices; (4) the report over the real fixture corpus +
 * plant matches the closed form end-to-end (decode, banding, verify).
 */
class MultimodalTruthSpec extends AnyFunSuite with SparkSpec {

  test("rendered pattern PNGs decode to their exact aHash patterns") {
    // anchors across the byte range (incl. sign-bit bytes) and every
    // variant shape the plant uses
    for (g <- Seq(0, 1, 63, 124, 125); p <- MultimodalTruthQueries.memberPatterns(g)) {
      val h = Multimodal.averageHash64(Multimodal.renderPatternPng(p))
      assert(h != null && h.longValue() == p,
        s"gadget $g pattern ${p.toHexString} decoded to " +
          s"${Option(h).map(_.longValue().toHexString)}")
    }
  }

  test("cross-gadget separation ≥ 14 bits over every member pair, all 126 gadgets") {
    val members = (0 until MultimodalTruthQueries.ParityBytes.length)
      .map(MultimodalTruthQueries.memberPatterns)
    var minSep = 64
    for (g1 <- members.indices; g2 <- members.indices if g1 < g2;
         a <- members(g1); b <- members(g2)) {
      val d = java.lang.Long.bitCount(a ^ b)
      if (d < minSep) minSep = d
    }
    assert(minSep >= 14, s"cross-gadget separation collapsed to $minSep bits")
  }

  test("within-gadget census: five pairs at {2,2,4,6,6}, (A,V8) outside the radius") {
    for (g <- Seq(0, 77, 125)) {
      val Seq(a, v2, v6, v8) = MultimodalTruthQueries.memberPatterns(g)
      def d(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
      assert(d(a, v2) == 2 && d(v6, v8) == 2 && d(v2, v6) == 4 &&
        d(a, v6) == 6 && d(v2, v8) == 6 && d(a, v8) == 8,
        s"gadget $g distances drifted")
      // the popcount window that makes the decoded hash exact
      Seq(a, v2, v6, v8).foreach { p =>
        val k = java.lang.Long.bitCount(p)
        assert(k >= 1 && k <= 63, s"pattern ${p.toHexString} popcount $k")
      }
    }
  }

  test("mm21 census over the sf0.001 corpus + plant matches the closed form") {
    val k = MultimodalTruthQueries.scaleOf(spark, "/root/testdata/sf0.001")
    val organic = Multimodal.mediaWithRealImages(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .filter(col("kind") === "image")
    val r = MultimodalTruthQueries.mm21Report(
      organic.unionByName(
        MultimodalTruthQueries.plantedMedia(spark, k).toDF())).collect().head
    val pb = MultimodalTruthQueries.PlantBase
    assert(r.getAs[Long]("found_total") == 5L * k)
    assert(r.getAs[Long]("h2_found") == 2L * k)
    assert(r.getAs[Long]("h4_found") == k.toLong)
    assert(r.getAs[Long]("h6_found") == 2L * k)
    assert(r.getAs[Long]("hamming_sum") == 20L * k)
    assert(r.getAs[Long]("id_checksum") ==
      10L * k * pb + 20L * k * (k - 1) + 15L * k)
  }
}

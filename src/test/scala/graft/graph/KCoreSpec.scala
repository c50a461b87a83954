package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** KCore peeling on crafted graphs: cascades, empty cores, the loud
  * non-convergence guard, and partitioning independence. */
class KCoreSpec extends AnyFunSuite with SparkSpec {

  private def edges(es: (Long, Long)*) = {
    import spark.implicits._
    es.toDF("a", "b")
  }

  // triangle {1,2,3} + K4 {10,11,12,13} + a pendant chain 3-4-5
  private val g = edges(
    (1L, 2L), (2L, 3L), (1L, 3L),
    (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L),
    (3L, 4L), (4L, 5L))

  test("2-core keeps the cycles, peels the pendant chain") {
    val core = KCore.kCore(g, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.keySet === Set(1L, 2L, 3L, 10L, 11L, 12L, 13L))
    assert(core(3L) === 2L) // chain edges gone from the core degree
  }

  test("3-core keeps only the K4; 4-core is empty") {
    val c3 = KCore.kCore(g, 3).collect().map(_.getLong(0)).toSet
    assert(c3 === Set(10L, 11L, 12L, 13L))
    assert(KCore.kCore(g, 4).count() === 0L)
  }

  test("a long peeling cascade converges round by round (path graph)") {
    // path 0-1-2-...-9: 2-core empty, peeled one endpoint pair per
    // round — the deepest cascade shape per edge count
    val path = edges((0L until 9L).map(i => (i, i + 1)): _*)
    assert(KCore.kCore(path, 2, maxRounds = 8).count() === 0L)
    // the same cascade must throw when the round budget is too small
    val e = intercept[IllegalArgumentException] {
      KCore.kCore(path, 2, maxRounds = 2).count()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("result is independent of input partitioning") {
    val base = KCore.kCore(g, 2).collect().map(_.toSeq).toSet
    val shuffled = KCore.kCore(g.repartition(7, col("b")), 2)
      .collect().map(_.toSeq).toSet
    assert(shuffled === base)
  }
}

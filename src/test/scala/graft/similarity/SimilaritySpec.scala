package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SimilaritySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // near query 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite
    (4L, Array(0.5f, 0.5f, 0.0f)))

  test("dot / norm / cosine on hand-checked vectors") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val row = df.select(
      Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.l2Norm(col("a")).as("na")).collect().head
    assert(row.getDouble(0) == 32.0)
    assert(math.abs(row.getDouble(1) - math.sqrt(14.0)) < 1e-12)
  }

  test("brute-force top-k ranks by cosine with id tiebreak, excludes self") {
    val df = vecs.toDF("id", "vec")
    val q = df.filter(col("id") === 0L)
    val out = Similarity.bruteForceTopK(df, q, k = 4).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.map(_.getAs[Long]("cand_id")).toSeq == Seq(1L, 4L, 2L, 3L))
    assert(out.head.getAs[Double]("cosine") > 0.99)
    assert(out.last.getAs[Double]("cosine") == -1.0)
    assert(!out.map(_.getAs[Long]("cand_id")).contains(0L))
  }

  test("IVF top-k on real embeddings: valid scores, measured recall vs exact") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val ivf = Similarity.ivfTopK(emb, q, k = 5, nCells = 8, nProbe = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    assert(ivf.size <= 50 && ivf.nonEmpty)
    val recall = (ivf & exact).size.toDouble / exact.size
    // unclustered random vectors are LSH/IVF's worst case; still expect
    // a sane fraction of the exact set from probing half the cells
    assert(recall > 0.2, s"recall $recall")
  }

  test("bucketed near-dup pairs ⊆ exact pairs, identical cosines, recall floor") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val exact = Similarity.nearDupPairs(emb, threshold = 0.3, dim = 64).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("cosine"))
      .toMap
    val bucketed = Similarity.nearDupPairs(emb, threshold = 0.3, dim = 64, bits = 4)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("cosine"))
      .toMap
    assert(bucketed.nonEmpty)
    bucketed.foreach { case (pair, cos) =>
      assert(exact.contains(pair), s"pair $pair not in exact set")
      assert(cos == exact(pair), s"pair $pair cosine drifted") // scores exact, recall is not
    }
    // seeded data + seeded planes → recall is a fixed number; 4-bit
    // bucketing of unclustered vectors keeps a modest but stable slice
    val recall = bucketed.size.toDouble / exact.size
    assert(recall >= 0.05, s"recall $recall below seeded floor")
  }

  test("LSH top-k returns a subset of the exact ranking with true cosines") {
    val df = vecs.toDF("id", "vec")
    val q = df.filter(col("id") === 0L)
    val exact = Similarity.bruteForceTopK(df, q, k = 4).collect()
      .map(r => r.getAs[Long]("cand_id") -> r.getAs[Double]("cosine")).toMap
    val approx = Similarity.lshTopK(df, q, k = 4, dim = 3, bits = 4).collect()
    approx.foreach { r =>
      val cid = r.getAs[Long]("cand_id")
      assert(exact.contains(cid))
      assert(r.getAs[Double]("cosine") == exact(cid)) // scores are exact, recall is not
    }
  }
}

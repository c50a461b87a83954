package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Invariants of the tx30 overlapping context-window chunking, checked
  * against an independent plain-Scala re-derivation over the fixture
  * corpus (the oracle gate pins cells; this pins the CONTRACT —
  * coverage, overlap, boundary arithmetic — in readable form). */
class TextChunkSpec extends AnyFunSuite with SparkSpec {

  private val W = 64
  private val S = 48

  test("tx30 chunks cover every token, overlap by W−S, and hash the exact slices") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Registry.byName("tx30_context_chunks")
      .run(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Int]("chunk_id"), r.getAs[Int]("start_tok"),
          r.getAs[Int]("n_chunk_tokens"), r.getAs[String]("chunk_hash"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty && got.size == docs.length)

    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1) // keep empty tokens, like split/str_split
      val n = toks.length
      val expectChunks =
        if (n <= W) 1 else math.ceil((n - W).toDouble / S).toInt + 1
      val chunks = got(id)
      assert(chunks.length == expectChunks, s"chunk count for doc $id")
      chunks.foreach { case (cid, start, len, hash) =>
        assert(start == cid * S)
        assert(len == math.min(n - start, W) && len > 0)
        assert(hash == md5hex(toks.slice(start, start + len).mkString(" ")))
      }
      // coverage: the last chunk reaches the final token exactly
      val (_, lastStart, lastLen, _) = chunks.last
      assert(lastStart + lastLen == n, s"doc $id tail uncovered")
      // interior consecutive chunks overlap by exactly W − S tokens
      chunks.sliding(2).foreach {
        case Array((_, s1, l1, _), (_, s2, _, _)) if l1 == W =>
          assert(s1 + l1 - s2 == W - S)
        case _ => ()
      }
    }
  }
}

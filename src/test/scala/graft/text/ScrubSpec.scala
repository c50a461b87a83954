package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ScrubSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("piiRedact masks every class and piiCounts sees each span") {
    val df = Seq(
      (1L, "mail me at jo.ann+x@sub.example.co or 192.168.0.1 then (555) 123-4567"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c@d.org one ip 10.1.2.3")).toDF("doc_id", "text")
    val out = df.select(
      Seq(col("doc_id")) ++
        Scrub.piiCounts(col("text")).map { case (n, c) => c.as(n) } :+
        Scrub.piiRedact(col("text")).as("red"): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L) == ((1, 1, 1, "mail me at <EMAIL> or <IP> then <PHONE>")))
    assert(out(2L) == ((0, 0, 0, "no pii here at all")))
    assert(out(3L) == ((2, 1, 0, "two mails <EMAIL> <EMAIL> one ip <IP>")))
  }

  test("segments splits into ordered width-token windows with a short tail") {
    val segs = Seq(Tuple1("a b c d e")).toDF("text")
      .select(Scrub.segments(col("text"), 2).as("s"))
      .collect().head.getSeq[String](0)
    assert(segs.toList == List("a b", "c d", "e"))
  }

  test("segmentDedup strikes only above-threshold segments, preserving order") {
    // 10 docs; "x y" appears in every doc (10 > 10/2=5 → boilerplate);
    // each doc's own "u<i> v<i>" appears once (kept)
    val docs = (0 until 10)
      .map(i => (i.toLong, s"u$i v$i x y k$i"))
      .toDF("doc_id", "text")
    val out = Scrub.segmentDedup(docs, "doc_id", "text",
        width = 2, thresholdDiv = 2.0)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out.size == 10)
    (0 until 10).foreach { i =>
      assert(out(i.toLong) == ((3, 1, s"u$i v$i k$i")))
    }
  }

  test("a pure-boilerplate document survives with empty text") {
    val docs = (Seq((99L, "x y")) ++ (0 until 9).map(i => (i.toLong, s"x y t$i")))
      .toDF("doc_id", "text")
    val out = Scrub.segmentDedup(docs, "doc_id", "text",
        width = 2, thresholdDiv = 2.0)
      .filter(col("doc_id") === 99).collect().head
    assert(out.getInt(1) == 1 && out.getInt(2) == 1 && out.getString(3) == "")
  }

  test("segment-dedup streaming state (counts) merges to the batch counts") {
    // fold-order-freedom witness: counts over two disjoint halves,
    // summed, equal counts over the whole — the property st19's
    // complete-mode aggregation relies on across micro-batches
    val docs = (0 until 20).map(i => (i.toLong, s"x y m${i % 3} n${i % 3}"))
      .toDF("doc_id", "text")
    val whole = Scrub.segmentCounts(docs, "text", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val halves = Scrub
      .segmentCounts(docs.filter(col("doc_id") < 10), "text", 2)
      .unionByName(Scrub.segmentCounts(docs.filter(col("doc_id") >= 10), "text", 2))
      .groupBy("seg").agg(sum("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(whole == halves)
  }

  private def substrOut(docs: Seq[(Long, String)], width: Int) =
    Scrub.substringDedup(docs.toDF("doc_id", "text"), "doc_id", "text", width)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap

  test("substringDedup keeps the corpus-wide first occurrence only") {
    // "ABCDE" appears in docs 1 and 2; doc 1 (min (doc, pos)) keeps it
    val out = substrOut(Seq(
      (1L, "xxABCDEyy"), (2L, "ppABCDEqq"), (3L, "nothing here")), 5)
    assert(out(1L) == ((9L, 0L, "xxABCDEyy")))
    assert(out(2L) == ((9L, 5L, "ppqq")))
    assert(out(3L) == ((12L, 0L, "nothing here")))
  }

  test("substringDedup merges overlapping duplicate windows into one span") {
    // the shared run "ABCDEF" yields two overlapping width-5 windows in
    // doc 2 (pos 1 and 2); coverage must merge to chars [1, 7), not
    // remove 10 chars
    val out = substrOut(Seq((1L, "ABCDEFzz"), (2L, "qABCDEFq")), 5)
    assert(out(1L)._2 == 0L)
    assert(out(2L) == ((8L, 6L, "qq")))
  }

  test("substringDedup strikes a within-document repeat") {
    // "HELLO" occurs twice in ONE doc: the first stays, the second goes
    val out = substrOut(Seq((7L, "HELLO--HELLO")), 5)
    assert(out(7L) == ((12L, 5L, "HELLO--")))
  }

  test("substringDedup leaves short documents and is partition-stable") {
    val docs = Seq((1L, "abc"), (2L, "abc"), (3L, "same30chars___same30chars___X"),
      (4L, "same30chars___same30chars___X"))
    val base = substrOut(docs, 8)
    assert(base(1L) == ((3L, 0L, "abc"))) // shorter than width: untouched
    // doc 3 is periodic (period 14), so its second period self-dedups
    // against its first; doc 4 duplicates doc 3 wholesale and loses
    // every window to doc 3's first occurrences
    assert(base(3L) == ((29L, 14L, "same30chars___X")))
    assert(base(4L) == ((29L, 29L, "")))
    val repart = Scrub.substringDedup(
      docs.toDF("doc_id", "text").repartition(7, col("text")),
      "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(repart == base)
  }
}

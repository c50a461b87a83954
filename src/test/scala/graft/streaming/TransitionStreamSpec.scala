package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins [[TransitionStream]]'s exactness claims: pairs follow EVENT
  * time (not arrival order), emission waits for watermark passage, the
  * anchor bridges batch splits, and ts ties break on event_id. */
class TransitionStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("transition pairs follow event time across out-of-order batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Long, String)]
    val name = "graft_trans_test"
    spark.catalog.dropTempView(name)
    val stream = ms.toDS().toDF("user_id", "ts", "event_id", "event_type")
    val q = TransitionStream.transitionsWithState(stream)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      // batch 1 arrives OUT of event-time order (purchase before click)
      ms.addData(Seq(
        (1L, t("2024-01-01 10:00:00"), 1L, "view"),
        (1L, t("2024-01-01 10:10:00"), 3L, "purchase")))
      q.processAllAvailable()
      // batch 2 back-fills the interior click (within the 2 h delay)
      ms.addData(Seq(
        (1L, t("2024-01-01 10:05:00"), 2L, "click"),
        (1L, t("2024-01-01 10:40:00"), 4L, "view")))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0,
        "no pair may emit before the watermark passes its later event")
      // sentinel pushes the watermark far past every buffered event
      ms.addData(Seq((99L, t("2024-01-03 00:00:00"), 99L, "view")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).filter(col("user_id") === 1L)
      .orderBy("to_us")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // event-time order view→click→purchase→view, despite arrival order
    assert(got == Seq(
      ("view", "click"), ("click", "purchase"), ("purchase", "view")))
  }

  test("anchor bridges finalized batches; ts ties break on event_id") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Long, String)]
    val name = "graft_trans_anchor_test"
    spark.catalog.dropTempView(name)
    val stream = ms.toDS().toDF("user_id", "ts", "event_id", "event_type")
    val q = TransitionStream.transitionsWithState(stream)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      // same ts, ids force (a, b) order; sentinel finalizes them
      ms.addData(Seq(
        (1L, t("2024-01-01 09:00:00"), 2L, "b"),
        (1L, t("2024-01-01 09:00:00"), 1L, "a")))
      ms.addData(Seq((98L, t("2024-01-02 00:00:00"), 98L, "view")))
      q.processAllAvailable()
      // a LATER event for user 1: its pair must anchor on the already-
      // finalized "b" from the previous watermark epoch
      ms.addData(Seq((1L, t("2024-01-02 01:00:00"), 5L, "c")))
      ms.addData(Seq((99L, t("2024-01-05 00:00:00"), 99L, "view")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).filter(col("user_id") === 1L)
      .orderBy("to_us")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(("a", "b"), ("b", "c")))
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Loader contracts against the CURRENT driver fixtures.
  *
  * [[Tables.eventsRaw]]'s nanos-legacy fallback mutates session config
  * (`spark.sql.legacy.parquet.nanosAsLong`) because Spark offers no
  * per-relation override — acceptable only while the fallback is
  * UNREACHABLE. This spec pins that: a fixture regeneration that ships
  * TIMESTAMP(NANOS) again would silently start mutating the shared
  * session on every load, and must turn a test red instead.
  */
class TablesSpec extends AnyFunSuite with SparkSpec {

  test("events reads natively on current fixtures — the nanos-legacy session mutation is unreachable") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, s"$dir ts type")
      assert(df.limit(1).count() == 1L, s"$dir events readable")
      // the conf must still be at its default — Some("true") here means
      // eventsRaw's catch branch ran and the session was mutated
      assert(spark.conf.get(key, "false") == "false",
        s"eventsRaw reached the nanos fallback on $dir and mutated the session")
    }
  }

  test("streaming events loader is equally fallback-free on current fixtures") {
    // EventStream.readEvents used to set the legacy-nanos conf
    // UNCONDITIONALLY before probing the footer — caught by the batch
    // pin above when the whole suite shares one session. Pin the
    // streaming loader separately so the discipline can't regress on
    // either path.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val df = graft.streaming.EventStream.readEvents(
      spark, "/root/testdata/sf0.001/events.parquet")
    assert(df.isStreaming)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(spark.conf.get(key, "false") == "false",
      "readEvents mutated the session on a MICROS fixture")
  }
}

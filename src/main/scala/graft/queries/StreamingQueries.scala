package graft.queries

import graft.streaming.EventStream

/**
 * Streaming-executed queries: the result is produced by a real
 * Structured Streaming query (file source → stateful aggregation →
 * memory sink, drained synchronously), and must equal the equivalent
 * batch SQL — which is exactly what the DuckDB oracle asserts.
 */
object StreamingQueries {

  private val st01Oracle =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  private val st02Oracle =
    "SELECT event_id, user_id, event_type, value FROM events"

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("st01_stream_hourly", EventStream.hourlyStats, Some(st01Oracle)),
    GraftQuery("st02_stream_dedup", EventStream.dedupReplay, Some(st02Oracle)))
}

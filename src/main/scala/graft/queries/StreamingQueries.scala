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

  private val st03Oracle =
    """WITH dim AS (
      |  SELECT event_type,
      |    CASE event_type WHEN 'purchase' THEN 'Purchase Checkout'
      |                    WHEN 'click' THEN 'Click'
      |                    WHEN 'view' THEN 'Page View'
      |                    WHEN 'signup' THEN 'Signup'
      |                    WHEN 'refund' THEN 'Refund'
      |                    ELSE 'Unknown Event' END AS display_name,
      |    CASE WHEN event_type IN ('purchase','refund') THEN 'commerce'
      |         WHEN event_type IN ('click','view') THEN 'engagement'
      |         ELSE 'Other' END AS category
      |  FROM (SELECT DISTINCT event_type FROM events) t)
      |SELECT d.category, d.display_name, COUNT(*) AS n_events,
      |  CAST(ROUND(SUM(CAST(e.value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
      |FROM events e LEFT JOIN dim d ON e.event_type = d.event_type
      |GROUP BY 1, 2""".stripMargin

  // Micros-domain time bound: Spark timestamps are micros-precision,
  // so comparing epoch_us values reproduces the stream's comparison
  // exactly regardless of the parquet file's declared NANOS unit.
  private val st04Oracle =
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
      |  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us,
      |  p.value AS purchase_value
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      | AND p.event_type = 'purchase' AND c.event_type = 'click'
      | AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 1800000000 AND epoch_us(p.ts)""".stripMargin

  // Same micros-domain bound as st04; the WHERE restricts both engines
  // to the finalized region (see outerIntervalJoinReplay): purchases
  // behind min(max purchase_ts, max click_ts) − 3 h — the global
  // watermark is the min of the per-side maxima minus the 2 h delay,
  // and each side's max can trail the corpus max by hours on a sparse
  // stream, so the cutoff must come from the side maxima.
  private val st05Oracle =
    """WITH m AS (SELECT LEAST(
      |    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'purchase'),
      |    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'click'))
      |    - 10800000000 AS cutoff),
      |p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT * FROM events WHERE event_type = 'click')
      |SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
      |  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us,
      |  p.value AS purchase_value
      |FROM p CROSS JOIN m
      |LEFT JOIN c ON p.user_id = c.user_id
      |  AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 1800000000 AND epoch_us(p.ts)
      |WHERE epoch_us(p.ts) <= m.cutoff""".stripMargin

  // st06 batch parity: plain-SQL gap sessionization — LAG/gap-cut/
  // running-sum (ordered by (ts, event_id) so ts ties resolve the same
  // way the stream's (first_ts, first_id) merge key does), per-session
  // first event via FIRST_VALUE under the same ordering, conversion
  // via BOOL_OR, money in exact integer cents. The WHERE restricts
  // both engines to the finalized region (sessions ending ≥ delay +
  // gap + 1 h margin behind the corpus max — see sessionStateReplay).
  // Shared session CTE chain (st06 + st16): gap sessionization with the
  // same (tus, event_id) ordering and cents math the stateful stream
  // uses, plus the finalized-region cutoff.
  private val sessCtes =
    """m AS (
      |  SELECT MAX(epoch_us(ts)) - 12600000000 AS cutoff FROM events),
      |seq AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tus, event_type, value,
      |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |marked AS (
      |  SELECT user_id, event_id, tus, event_type, value,
      |    CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM seq),
      |sess AS (
      |  SELECT user_id, event_id, tus, event_type, value,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked),
      |sess2 AS (
      |  SELECT user_id, event_id, tus, event_type, value, sid,
      |    FIRST_VALUE(event_type) OVER (PARTITION BY user_id, sid ORDER BY tus, event_id) AS first_type
      |  FROM sess)""".stripMargin

  private val st06Oracle =
    s"""WITH $sessCtes,
      |agg AS (
      |  SELECT user_id, sid,
      |    MIN(tus) AS session_start_us, MAX(tus) AS session_end_us,
      |    COUNT(*) AS n_events,
      |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |    MIN(first_type) AS first_type,
      |    BOOL_OR(event_type = 'purchase') AS has_purchase
      |  FROM sess2 GROUP BY user_id, sid)
      |SELECT user_id, session_start_us, session_end_us, n_events,
      |  sum_cents, first_type, has_purchase
      |FROM agg CROSS JOIN m
      |WHERE session_end_us <= m.cutoff""".stripMargin

  // st16 batch parity: q41's attribution chain over the FINALIZED
  // sessions only (the streamed result can never include a session the
  // watermark has not closed). Purchase money re-aggregates per session
  // first, matching the stream's per-session accumulators.
  private val st16Oracle =
    s"""WITH $sessCtes,
      |agg AS (
      |  SELECT user_id, sid, MAX(tus) AS session_end_us,
      |    MIN(first_type) AS first_type,
      |    COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
      |    COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
      |      FILTER (WHERE event_type = 'purchase'), 0) AS purchase_cents
      |  FROM sess2 GROUP BY user_id, sid)
      |SELECT first_type, CAST(SUM(n_purchases) AS BIGINT) AS n_purchases,
      |  CAST(SUM(purchase_cents) AS BIGINT) AS revenue_cents
      |FROM agg CROSS JOIN m
      |WHERE session_end_us <= m.cutoff AND n_purchases > 0
      |GROUP BY 1""".stripMargin

  // st30 batch parity: q54's LEAD chain over (epoch_us, event_id) —
  // the stream's exact ordering — keeping only pairs whose LATER event
  // precedes the finalized-region cutoff (delay 2 h + 1 h of
  // batch-boundary margin behind the corpus max, the st06 discipline).
  private val st30Oracle =
    """WITH m AS (
      |  SELECT MAX(epoch_us(ts)) - 10800000000 AS cutoff FROM events),
      |seq AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS to_type,
      |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS to_us
      |  FROM events),
      |c AS (
      |  SELECT from_type, to_type, COUNT(*) AS n
      |  FROM seq CROSS JOIN m
      |  WHERE to_type IS NOT NULL AND to_us <= m.cutoff GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE)
      |    AS p
      |FROM c""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("st01_stream_hourly", EventStream.hourlyStats, Some(st01Oracle), headline = true),
    GraftQuery("st02_stream_dedup", EventStream.dedupReplay, Some(st02Oracle)),
    GraftQuery("st03_stream_enrich", EventStream.enrichReplay, Some(st03Oracle)),
    GraftQuery("st04_stream_interval_join", EventStream.intervalJoinReplay, Some(st04Oracle)),
    GraftQuery("st05_stream_outer_join", EventStream.outerIntervalJoinReplay, Some(st05Oracle)),
    GraftQuery("st06_stream_sessions", EventStream.sessionStateReplay, Some(st06Oracle)),
    // st07 carries tx22's oracle verbatim: the streaming probe runs the
    // same batch plan per micro-batch over the same delta/corpus split,
    // so its accumulated matches must equal the batch result exactly
    GraftQuery("st07_stream_incremental_dedup",
      graft.streaming.DocumentProbeStream.incrementalDedupReplay,
      None, oracleGen = Some(TextQueries.tx22OracleGen)),
    // st08 carries dq04's oracle verbatim: the stream maintains the
    // cohort counters (complete mode ≡ batch aggregation) and the
    // report is the same driftFromCounts view dq04 runs
    GraftQuery("st08_stream_cohort_drift",
      EventStream.cohortDriftReplay, Some(QualityQueries.dq04Oracle)),
    // st09: multimodal ingest as a stream — stateless decode stages on
    // the streaming frame; every streamed hash must equal the
    // independent reference implementation's value for that id
    GraftQuery("st09_stream_media_hashes",
      graft.streaming.DocumentProbeStream.mediaHashReplay,
      None, oracleGen = Some(MultimodalQueries.st09OracleGen)),
    // st10 carries dq06's oracle verbatim: the stream maintains the
    // per-(type, value) cohort counters and the KS statistic is the
    // same ksFromCounts view dq06 runs over batch counts
    GraftQuery("st10_stream_ks_drift",
      EventStream.ksDriftReplay, Some(QualityQueries.dq06Oracle)),
    // st11 carries q35's oracle verbatim: the stream maintains the
    // distinct (user, week) activity frame (complete mode ≡ batch
    // distinct) and the report is the same retentionFromWeeks view
    GraftQuery("st11_stream_retention",
      EventStream.retentionReplay, Some(AdvancedQueries.q35Oracle)),
    // st12 carries dq09's oracle verbatim: the stream maintains the
    // (type, bin) histogram counters, the report view is shared
    GraftQuery("st12_stream_histogram",
      EventStream.histogramReplay, Some(QualityQueries.dq09Oracle)),
    // st13 carries dq10's oracle verbatim: the router is a stateless
    // projection, so streaming it is append mode with no state at all
    GraftQuery("st13_stream_quarantine",
      EventStream.quarantineReplay, Some(QualityQueries.dq10Oracle)),
    // st14 carries q39's oracle verbatim: the stream maintains each
    // user's first-seen day, the growth-curve view is shared
    GraftQuery("st14_stream_user_growth",
      EventStream.userGrowthReplay, Some(AdvancedQueries.q39Oracle)),
    // st15 carries dq11's oracle verbatim: the model (per-type exact
    // moments) fits in batch, the stream scores statelessly through
    // the same broadcast projection
    GraftQuery("st15_stream_zscore",
      EventStream.zscoreReplay, Some(QualityQueries.dq11Oracle)),
    // st16: q41's attribution report folded from the stateful
    // sessionizer's emitted sessions — the per-session purchase
    // accumulators make the report a 5-row aggregate of state output,
    // with no second pass over raw events
    GraftQuery("st16_stream_attribution",
      EventStream.attributionStateReplay, Some(st16Oracle)),
    // st17 carries io15's oracle verbatim: the stream maintains only
    // the per-key latest change (keep-max-seq is order-insensitive
    // across batches; tombstones block late lower-seq resurrections)
    // and the final table is ONE batch applyChangeFeed of that state
    GraftQuery("st17_stream_cdc_apply",
      graft.streaming.ChangeFeedStream.cdcApplyReplay,
      Some(StorageQueries.io15Oracle)),
    // st18 carries tx34's oracle verbatim: the scrub is a stateless
    // projection (plant/count/mask), so streaming it is append mode
    // with no state at all — the st13 shape at the document firehose
    GraftQuery("st18_stream_pii_scrub",
      graft.streaming.ScrubStream.piiScrubReplay, Some(TextQueries.tx34Oracle)),
    // st19 carries tx35's oracle verbatim: the stream maintains the
    // per-segment occurrence counters (complete mode ≡ batch hash
    // aggregate — counts are fold-order-free) and the strike pass is
    // the same strikeBoilerplate view the batch operator runs
    GraftQuery("st19_stream_segment_dedup",
      graft.streaming.ScrubStream.segmentDedupReplay, Some(TextQueries.tx35Oracle)),
    // st20 carries dq13's oracle verbatim: the stream maintains the
    // (type, day) volume counters (complete mode ≡ batch aggregation)
    // and the scaled-integer EWMA walk is the shared ewmaFromDaily view
    GraftQuery("st20_stream_ewma",
      EventStream.ewmaReplay, Some(QualityQueries.dq13Oracle)),
    // st21 carries tx37's oracle verbatim: the stream maintains the
    // per-window (count, min-(doc, pos)) carriers — both fold-order-
    // free, so the keep-first pick survives any micro-batch arrival
    // order — and the strike pass is the shared strikeSubstrings view
    GraftQuery("st21_stream_substring_dedup",
      graft.streaming.ScrubStream.substringDedupReplay,
      Some(TextQueries.tx37Oracle)),
    // st22 carries q46's oracle verbatim: the stream maintains the
    // distinct (user, day) activity frame (complete mode ≡ batch
    // distinct — the st11 shape at day grain) and the trailing-window
    // distinct count is the shared rollingFromUserDays sweep
    GraftQuery("st22_stream_rolling_distinct",
      EventStream.rollingActivesReplay, Some(AdvancedQueries.q46Oracle)),
    // st23 carries dq14's oracle verbatim: the stream maintains the
    // (type, day) volume counters (st20's exact state contract) and
    // the weekday profile is the shared seasonalFromDaily view
    GraftQuery("st23_stream_seasonal",
      EventStream.seasonalReplay, Some(QualityQueries.dq14Oracle)),
    // st24: io19's write-audit-publish discipline at the streaming
    // sink — every micro-batch stages, audits the staged files, and
    // atomically publishes (or refuses, pinning the pointer, spec'd in
    // StreamingSpec); the fixture's batches are all clean, so the
    // published result is the last complete snapshot ≡ the batch SQL
    GraftQuery("st24_stream_audited_publish",
      graft.streaming.PublishStream.auditedPublishReplay,
      Some("""SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             |  COUNT(*) AS n
             |FROM events GROUP BY 1, 2""".stripMargin)),
    // st25 carries dq17's oracle verbatim: the stream maintains the
    // per-(type, bin) cohort counters (complete mode ≡ batch
    // aggregation) and the exact-integer-numerator TVD report is the
    // shared tvdFromCounts view — the st08/st12 recipe applied to the
    // log-free drift aggregate
    GraftQuery("st25_stream_binned_tvd",
      EventStream.binnedTvdReplay, Some(QualityQueries.dq17Oracle)),
    // st26 carries dq16's oracle verbatim: the stream maintains the
    // per-token counters (complete mode ≡ batch aggregation — counts
    // are fold-order-free) and the threshold/share report is the
    // shared heavyHittersFromCounts view
    GraftQuery("st26_stream_heavy_hitters",
      graft.streaming.ScrubStream.heavyHittersReplay,
      Some(QualityQueries.dq16Oracle)),
    // st27 carries dq18's oracle verbatim: the stream maintains the
    // per-type (count, last-arrival) aggregates — fold-order-free —
    // and the lag/staleness report is the shared freshnessFromCounts
    // view over the drained state
    GraftQuery("st27_stream_freshness",
      EventStream.freshnessReplay, Some(QualityQueries.dq18Oracle)),
    // st28 carries dq19's oracle verbatim: the stream maintains the
    // per-(type, value) counters and the modal pick + share report is
    // the shared modalFromCounts view (grouped top-1 included)
    GraftQuery("st28_stream_modal_values",
      EventStream.modalValuesReplay, Some(QualityQueries.dq19Oracle)),
    // st29 carries q52's oracle verbatim: the stream maintains the
    // per-customer spend cents (exact decimal sum — fold-order-free,
    // state bounded by customers, not order volume) and the Pareto
    // frontier is the shared customerSkyline view over the drained
    // state joined to the static dim
    GraftQuery("st29_stream_skyline",
      graft.streaming.SkylineStream.skylineReplay,
      Some(AdvancedQueries.q52Oracle)),
    // st30: q54's transition matrix maintained on the stream — exact
    // pair emission under out-of-order arrival (watermark-finalized
    // prefix + one anchor row per user), gated by q54's LEAD chain
    // restricted to the finalized region
    GraftQuery("st30_stream_transitions",
      graft.streaming.TransitionStream.transitionReplay, Some(st30Oracle)),
    // st31 carries dq22's oracle verbatim: the stream maintains the
    // per-variant moment counters (2 state rows; decimal sums are
    // fold-order-free) and the Welch-t / z readout is the shared
    // abFromMoments view over the drained state
    GraftQuery("st31_stream_ab_readout",
      EventStream.abReadoutReplay, Some(QualityQueries.dq22Oracle)),
    // st32 carries dq23's oracle verbatim: the stream maintains the
    // day-sharded HLL registers (per-(day, bucket) MAX — fold-order-
    // free, calendar-bounded state) and the merge/spine/estimate
    // report is the shared hllReportFromDaily view over the drained
    // registers — incremental cardinality without rescanning the past
    GraftQuery("st32_stream_hll_sketch",
      EventStream.hllSketchReplay, Some(QualityQueries.dq23Oracle)),
    // st33 carries dq26's oracle verbatim: the stream maintains the
    // per-shard bottom-K quantile signatures as CUSTOM
    // mapGroupsWithState state (min-union fold — order-free; K-bounded
    // per shard, never volume-bounded) and the merge/quantile/probe
    // report is the shared qsReportFromSignatures view over the
    // drained state — merge_ok becomes the stream≡batch boolean
    GraftQuery("st33_stream_qsketch",
      graft.streaming.QuantileSketchStream.quantileSketchReplay,
      Some(QualityQueries.dq26Oracle)))
}

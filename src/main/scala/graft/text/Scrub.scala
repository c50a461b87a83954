package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Corpus-scrubbing operators for a training-data pipeline: PII
 * redaction and corpus-level boilerplate (duplicate-segment) removal.
 *
 * Both are deliberately shaped for the 100 TB case:
 *
 *  - [[piiCounts]] / [[piiRedact]] are pure per-row column expressions
 *    over Spark's codegen'd `regexp_count` / `regexp_replace` — zero
 *    shuffles, zero state, embarrassingly parallel, and safe to run
 *    inside a streaming micro-batch (the stateless scrub-at-ingest
 *    shape; see st18).
 *
 *  - [[segmentDedup]] is the CCNet / RefinedWeb-style corpus-level
 *    duplicate-segment removal (Lee et al. 2022, "Deduplicating
 *    Training Data Makes Language Models Better"): segments that
 *    repeat across the corpus above a frequency threshold are
 *    boilerplate and are struck from every document. The plan never
 *    regroups the corpus: pass 1 aggregates segment counts (narrow
 *    (seg) rows, map-side combine), the above-threshold survivors —
 *    a SMALL set by construction, at most totalSegments/threshold
 *    entries — collapse into one broadcast row, and pass 2 rebuilds
 *    each document MAP-SIDE with array `filter`/`concat_ws` against
 *    the broadcast set. The only exchange in the whole plan is the
 *    segment-count aggregate; document text never shuffles at all.
 */
object Scrub {

  /** PII patterns. One dialect-portable regex per class: RE2 (DuckDB)
    * and java.util.regex agree on these constructs (char classes,
    * bounded repeats, `\b`, no backrefs / lookaround). */
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhoneRe = """\(555\) \d{3}-\d{4}"""
  val Ipv4Re  = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** Per-class PII hit counts for `text` — codegen'd, map-side. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(text, lit(EmailRe)),
    "n_ip"    -> regexp_count(text, lit(Ipv4Re)),
    "n_phone" -> regexp_count(text, lit(PhoneRe)))

  /** `text` with every PII span masked by a typed placeholder. Email
    * is masked FIRST (its local part may contain digit runs the later
    * patterns could otherwise nibble at), then phone, then IPv4. */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Non-overlapping `width`-token segments of `text`, in order —
    * a pure map-side array expression (the last segment may be
    * shorter when the token count is not a multiple of `width`). */
  def segments(text: Column, width: Int): Column = {
    val toks = split(text, " ")
    transform(
      sequence(lit(0), ceil(size(toks) / lit(width.toDouble)).cast(IntegerType) - 1),
      i => concat_ws(" ", slice(toks, i * width + 1, lit(width))))
  }

  /**
   * Corpus-level duplicate-segment removal. Every document is split
   * into non-overlapping `width`-token segments; a segment whose
   * corpus-wide occurrence count exceeds `docs_total / thresholdDiv`
   * is boilerplate and is removed from every document (the threshold
   * scales with the corpus, so the operator's selectivity is stable
   * across tiers instead of silently degrading to all-or-nothing).
   *
   * Output: (idCol, n_segments, n_dropped, clean_text) — clean_text
   * is the surviving segments rejoined in original order ('' when a
   * document was pure boilerplate; the row survives, the text doesn't).
   *
   * Scale shape (see object doc): one hash aggregate over narrow
   * (segment) rows is the only exchange; the boilerplate set rides a
   * single-row broadcast and the rebuild is map-side array algebra —
   * document text is never exploded into a shuffle and never
   * regrouped.
   */
  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
                   width: Int = 2, thresholdDiv: Double = 25.0): DataFrame =
    strikeBoilerplate(docs, segmentCounts(docs, textCol, width),
      idCol, textCol, width, thresholdDiv)

  /** Corpus-wide occurrence count per segment — the ONLY exchange in
    * the segment-dedup plan (narrow (seg) rows, map-side combine).
    * Also the state a streaming twin maintains: a streaming groupBy
    * over the same expression keeps per-segment counters partitioned
    * across the state store exactly as this hash aggregate partitions
    * across executors (see st19). */
  def segmentCounts(docs: DataFrame, textCol: String, width: Int): DataFrame =
    docs.select(explode(segments(col(textCol), width)).as("seg"))
      .groupBy(col("seg")).agg(count(lit(1)).as("n"))

  /** The strike pass over precomputed [[segmentCounts]] — shared by
    * the batch operator and the streaming twin's drained-state view.
    * Above-threshold survivors collapse to ONE row (≤ totalSegs/thr
    * entries by pigeonhole — broadcast-sized at any corpus scale) and
    * every document rebuilds map-side against the broadcast set. */
  def strikeBoilerplate(docs: DataFrame, counts: DataFrame,
                        idCol: String, textCol: String,
                        width: Int, thresholdDiv: Double): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("__n"))
    val boiler = counts.crossJoin(broadcast(nDocs))
      .filter(col("n") > col("__n") / thresholdDiv)
      .agg(collect_set(col("seg")).as("__bl"))
    docs.select(col(idCol), segments(col(textCol), width).as("__segs"))
      .crossJoin(broadcast(boiler)).select(
        col(idCol),
        size(col("__segs")).as("n_segments"),
        size(filter(col("__segs"), s => array_contains(col("__bl"), s)))
          .as("n_dropped"),
        concat_ws(" ",
          filter(col("__segs"), s => !array_contains(col("__bl"), s)))
          .as("clean_text"))
  }

  /**
   * Exact duplicated-SUBSTRING removal — the other half of Lee et al.
   * 2022 (ExactSubstr): a `width`-char window of text that occurs
   * anywhere else in the corpus is a duplicated span, and every
   * occurrence EXCEPT the corpus-wide first (min (doc, pos)) is
   * struck from its document. Unlike [[segmentDedup]]'s aligned
   * token segments, windows here OVERLAP (stride 1), so consecutive
   * duplicate windows merge into one covered span and the rebuild is
   * an interval-coverage walk, not an array filter.
   *
   * Output: (idCol, n_chars, n_removed, clean_text).
   *
   * Scale shape: the corpus explodes once into narrow (id, pos, win)
   * rows; per-window stats are ONE hash aggregate (count + min
   * (id, pos) carrier — map-side combine, skew-tolerant: a window
   * repeated a million times still partial-aggregates, where a
   * row_number-over-window plan would sort all million rows in one
   * task). The join back to occurrences reuses the same (win)
   * exchange (canonicalized identically → ReuseExchange plans one
   * scan). Duplicate positions regroup per document — a delta-sized
   * frame, not the corpus — and the span merge + text rebuild run
   * inside a codegen'd higher-order `aggregate` over each document's
   * sorted position array, map-side. The recursion is inherently
   * sequential per document but bounded by the document's own dup
   * count; across documents it is embarrassingly parallel.
   */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
                     width: Int = 30): DataFrame =
    strikeSubstrings(docs, substringStats(docs, idCol, textCol, width),
      idCol, textCol, width)

  /** The corpus's window occurrences — narrow `(__id, __p, __w)` rows,
    * map-side (one explode + substring per document position). */
  def substringWindows(docs: DataFrame, idCol: String, textCol: String,
                       width: Int): DataFrame =
    docs
      .filter(length(col(textCol)) >= width)
      .select(col(idCol).as("__id"), col(textCol).as("__t"),
        explode(sequence(lit(0), length(col(textCol)) - width)).as("__p"))
      .select(col("__id"), col("__p"),
        col("__t").substr(col("__p") + 1, lit(width)).as("__w"))

  /** Per-window occurrence count + min-(doc, pos) carrier — the ONLY
    * shuffled state of the substring dedup, and what its streaming
    * twin (st21) maintains: both `count` and `min(struct)` are
    * fold-order-free declarative aggregates, so complete-mode
    * streaming state equals this batch aggregate on any micro-batch
    * split of the corpus. */
  def substringStats(docs: DataFrame, idCol: String, textCol: String,
                     width: Int): DataFrame =
    substringWindows(docs, idCol, textCol, width).groupBy(col("__w")).agg(
      count(lit(1)).as("__c"),
      min(struct(col("__id"), col("__p"))).as("__first"))

  /** The strike pass over precomputed [[substringStats]] — shared by
    * the batch operator and the streaming twin's drained-state view.
    * Recomputes the occurrence rows map-side from `docs` (in the batch
    * composition both legs canonicalize to one exchange via
    * ReuseExchange) and rebuilds each document's text by the interval-
    * coverage walk. */
  def strikeSubstrings(docs: DataFrame, stats: DataFrame,
                       idCol: String, textCol: String,
                       width: Int): DataFrame = {
    val occ = substringWindows(docs, idCol, textCol, width)
    val dups = occ.join(stats, "__w")
      .filter(col("__c") >= 2 &&
        !(col("__first.__id") === col("__id") && col("__first.__p") === col("__p")))
      .select(col("__id"), col("__p"))
    val perDoc = dups.groupBy(col("__id"))
      .agg(sort_array(collect_list(col("__p"))).as("__ps"))
    val ps = coalesce(col("__ps"),
      array().cast(ArrayType(IntegerType)))
    val text = col(textCol)
    val init = struct(lit(0).as("cur"), lit("").as("acc"))
    val clean = aggregate(ps, init,
      (st, p) => struct(
        greatest(st.getField("cur"), p + width).as("cur"),
        when(p > st.getField("cur"),
          concat(st.getField("acc"),
            text.substr(st.getField("cur") + 1, p - st.getField("cur"))))
          .otherwise(st.getField("acc")).as("acc")),
      st => concat(st.getField("acc"),
        text.substr(st.getField("cur") + 1, length(text) - st.getField("cur"))))
    docs.join(perDoc, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        length(text).cast(LongType).as("n_chars"),
        (length(text) - length(clean)).cast(LongType).as("n_removed"),
        clean.as("clean_text"))
  }

  /** The full tx34/st18 scrub report over a documents frame (batch or
    * streaming — every stage is a stateless per-row projection):
    * plant the synthetic spans, then count and mask. */
  def piiScrubReport(docs: DataFrame): DataFrame = {
    val planted = plantSyntheticPii(col("text"), col("doc_id"))
    docs.select(
      Seq(col("doc_id"), col("lang")) ++
        piiCounts(planted).map { case (n, c) => c.as(n) } :+
        piiRedact(planted).as("redacted"): _*)
  }

  /** Deterministic doc_id-derived PII spans appended to `text` — the
    * synthetic corpus carries no real PII, so the tx34/st18 gates
    * plant their own (every doc an email, every 2nd an IPv4, every
    * 3rd a phone; the DuckDB oracle plants the identical spans in
    * SQL). Fixture augmentation, not part of the operator. */
  def plantSyntheticPii(text: Column, id: Column): Column = concat(
    text, lit(" contact user"), id.cast(StringType), lit("@mail.example.com"),
    when(id % 2 === 0, concat(lit(" from 10."),
      (id % 200 + 1).cast(StringType), lit("."),
      (id % 250 + 1).cast(StringType), lit("."),
      ((id * 7) % 250 + 1).cast(StringType))).otherwise(""),
    when(id % 3 === 0, concat(lit(" call (555) "),
      lpad((id % 1000).cast(StringType), 3, "0"), lit("-"),
      lpad(((id * 13) % 10000).cast(StringType), 4, "0"))).otherwise(""))
}

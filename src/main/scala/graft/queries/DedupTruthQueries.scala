package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sources.Tables

/**
 * PLANTED-TRUTH gate for the banded-LSH near-dup path — the
 * [[GraphTruthQueries]] playbook applied to the engine's marquee
 * capability. The structural problem it solves: tx06's recall is
 * MEASURED only against tx13's exact all-pairs ground truth, whose
 * quadratic oracle is affordable only to sf0.01 — so at the deep
 * tiers the LSH family gated output determinism, not whether recall
 * silently rots as buckets deepen and the `maxBucket` cap starts
 * firing.
 *
 * tx52 instead runs the REAL operator
 * ([[Dedup.nearDupPairsWithStats]], production parameters) over the
 * ORGANIC corpus unioned with gadget documents whose pairwise Jaccard
 * is known in closed form from the token layout, so the oracle is
 * pure arithmetic (one `COUNT(*)` over documents, no pair discovery):
 *
 *  - POSITIVE pairs (count = scale K): two docs built from the same
 *    period-3 token sequence, rotated — different raw text, IDENTICAL
 *    distinct 3-gram shingle set {t0t1t2, t1t2t0, t2t0t1}. Identical
 *    sets make the MinHash signatures EQUAL, so all 4 bands collide
 *    and LSH finds the pair with certainty, with exact Jaccard 1.0 —
 *    a deterministic cell-exact anchor at every tier (found-count,
 *    J = 1.0 count, and an id-sum checksum all closed-form).
 *  - MID pairs (count = K, Jaccard = 27/29 ≈ 0.931): 30 unique
 *    tokens, last token swapped — 27 of 28+28 shingles shared. Above
 *    the 0.7 threshold but below certainty: per-band collision
 *    probability J^4, pair-level ≈ 0.996 under the fixed hash family.
 *    Emitted as a FLOOR boolean (found ≥ ceil(0.75·K)) — the honest
 *    form for an S-curve property (tx15's pinned-1.0 lesson): the
 *    engine is deterministic, so the gate is stable per fixture, and
 *    a recall collapse at depth (deep buckets, cap misfiring, banding
 *    drift) lands far below 0.75 and fails loudly.
 *  - NEGATIVE pairs (count = K, Jaccard = 18/38 ≈ 0.474): 30 tokens,
 *    last 10 swapped. Below threshold, so even when banding emits the
 *    candidate (~18% per pair at J^4 per band) the exact-Jaccard
 *    verify MUST kill it — found-count 0 is deterministic because the
 *    verification step, not the probabilistic banding, is the gate.
 *  - MEGA-CLUSTER (1200 identical-shingle docs > maxBucket = 1000):
 *    all four of its band buckets exceed the cap, so the anti-join
 *    drops them and ZERO mega pairs may appear. The cap witness is
 *    gated in a form that survives an ORGANICALLY capped corpus (the
 *    r17 exposure: the old row pinned total capped_buckets = 4, which
 *    held only because the organic corpus happens to have none — a
 *    fixture regeneration growing one organic boilerplate bucket
 *    would have failed the gate for the wrong reason): the total from
 *    [[Dedup.nearDupPairsWithStats]]'s stats frame gates as a FLOOR
 *    boolean (≥ 4), while the PLANTED share is cell-exact via
 *    [[Dedup.cappedBuckets]] restricted to the mega-cluster's four
 *    band keys — re-derived here from the mega text with the same
 *    public shingle/signature/band machinery, so planted buckets
 *    capped = 4 and planted rows dropped = 4·1200 stay exact pins no
 *    matter what the organic corpus does. "Recall held AND the cap
 *    fired honestly on the plant" remains one cell-exact row.
 *
 * Cross-family and planted-vs-organic contamination is impossible at
 * the OUTPUT: families use disjoint token alphabets (J = 0 across
 * them) and the exact-Jaccard verify filters any hash-coincidence
 * candidate, so the planted slice of the output (id ≥ 10^9, above any
 * organic doc_id at any tier) is exactly the closed-form set.
 *
 * Gated at sf0.01, sf0.1, 10x, corpus100 AND (r18) both skew tiers —
 * the oracle is O(1), so the deep-tier exclusion logic never applies.
 * At corpus100 the planted pairs ride buckets deepened by ~500k
 * organic docs — precisely the regime the sf0.01-only recall
 * measurement could not see; at the skew tiers the corpus carries its
 * own planted hot-key near-dup cluster, the organically-capped regime
 * the floor-plus-restricted-audit witness form exists for.
 */
object DedupTruthQueries {

  // disjoint id ranges, all above any organic doc_id at any tier
  // (corpus100 tops out around 5·10^5)
  private val PosBase = 1000000000L
  private val MidBase = 1100000000L
  private val NegBase = 1200000000L
  private val MegaBase = 1300000000L
  private val MegaSize = 1200 // > nearDupPairs' default maxBucket = 1000
  private val MegaText = (0 until 30).map(i => s"g52megax$i").mkString(" ")

  /** The mega-cluster's four (band, band_hash) keys, re-derived from
    * the one mega text with the production shingle/signature/band
    * machinery (identical texts → identical signature → these exact
    * keys). Restricting the bucket-grain cap audit to this frame is
    * what keeps the planted cap pins cell-exact even if the ORGANIC
    * corpus someday grows its own oversized bucket. */
  private def megaBandKeys(spark: SparkSession): DataFrame =
    spark.range(1).select(explode(Dedup.bandKeys(
        Dedup.minHashSignature(Dedup.shingleSet(lit(MegaText), 3), 16),
        bands = 4, rowsPerBand = 4)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))

  /** Gadget-count scale knob: documents / 100, floored at 1 — the
    * 1-row count is the only data the generator reads, so each
    * blow-up tier grows the plant by its own factor. */
  private def scaleOf(spark: SparkSession, dir: String): Long =
    math.max(Tables.documents(spark, dir).count() / 100L, 1L)

  /** The planted documents for scale `k` — exposed for the spec,
    * which re-derives the closed-form Jaccards with the exact
    * machinery and pins the construction invariants. */
  private[queries] def plantedDocs(spark: SparkSession, k: Long): DataFrame = {
    val g = col("id")
    def tok(pfx: String, i: Column): Column =
      concat(lit(pfx), g, lit("x"), i)

    // rotation pair: tokens t0 t1 t2 t0 t1 t2 vs t1 t2 t0 t1 t2 t0 —
    // different text, identical distinct shingle set
    def rot(shift: Int): Column =
      concat_ws(" ", (0 until 6).map(j => tok("p52g", lit((j + shift) % 3))): _*)
    val pos = spark.range(k).select(explode(array(
      struct((lit(PosBase) + g * 2).as("doc_id"), rot(0).as("text")),
      struct((lit(PosBase) + g * 2 + 1).as("doc_id"), rot(1).as("text"))
    )).as("d")).select(col("d.doc_id"), col("d.text"))

    // 30 unique tokens; `swapFrom` onward replaced in the B side
    def runText(pfx: String, swapPfx: String, swapFrom: Int): Column =
      concat_ws(" ", transform(sequence(lit(0), lit(29)),
        i => when(i < swapFrom, tok(pfx, i)).otherwise(tok(swapPfx, i))))
    def swapPair(base: Long, pfx: String, swapPfx: String,
                 swapFrom: Int): DataFrame =
      spark.range(k).select(explode(array(
        struct((lit(base) + g * 2).as("doc_id"),
          runText(pfx, pfx, 30).as("text")),
        struct((lit(base) + g * 2 + 1).as("doc_id"),
          runText(pfx, swapPfx, swapFrom).as("text"))
      )).as("d")).select(col("d.doc_id"), col("d.text"))

    val mid = swapPair(MidBase, "m52g", "m52q", 29) // J = 27/29
    val neg = swapPair(NegBase, "n52g", "n52q", 20) // J = 18/38

    val mega = spark.range(MegaSize.toLong)
      .select((lit(MegaBase) + g).as("doc_id"), lit(MegaText).as("text"))

    pos.unionByName(mid).unionByName(neg).unionByName(mega)
  }

  /** The gadget report over an already-unioned docs frame — factored
    * out so the spec can feed a corpus that ALSO contains an organic
    * oversized bucket and assert the planted pins survive it. */
  private[queries] def tx52Report(spark: SparkSession, docs: DataFrame,
                                  k: Long): DataFrame = {
    val (pairs, stats) =
      Dedup.nearDupPairsWithStats(docs, "doc_id", "text", minJaccard = 0.7)
    // bucket-grain cap audit, restricted to the plant's four band keys
    // (4-row broadcast): exact no matter what the organic corpus caps.
    // `bsz` counts EVERY row in the matched (band, band_hash) bucket,
    // so the 4·1200 pin additionally assumes no organic doc's band
    // xxhash64-collides with one of the four mega keys (64-bit keys —
    // astronomically unlikely); a future planted_dropped_rows drift of
    // a few units with everything else green is triaged as a
    // hash-collision fixture artifact, not operator rot.
    val plantedCap = Dedup.cappedBuckets(docs, "doc_id", "text")
      .join(broadcast(megaBandKeys(spark)), Seq("band", "band_hash"))
      .agg(coalesce(count(lit(1)), lit(0L)).as("planted_capped_buckets"),
        coalesce(sum(col("bsz")), lit(0L)).as("planted_dropped_rows"))
    val planted = pairs.filter(col("id_a") >= PosBase)
    val midFloor = math.ceil(0.75 * k).toLong
    planted.agg(
      coalesce(sum(when(col("id_a") < MidBase, 1L)), lit(0L))
        .as("pos_found"),
      coalesce(sum(when(col("id_a") < MidBase && col("jaccard") === 1.0, 1L)),
        lit(0L)).as("pos_exact"),
      coalesce(sum(when(col("id_a") < MidBase, col("id_a") + col("id_b"))),
        lit(0L)).as("pos_id_checksum"),
      coalesce(sum(when(col("id_a") >= MidBase && col("id_a") < NegBase, 1L)),
        lit(0L)).as("__mid_found"),
      coalesce(sum(when(col("id_a") >= NegBase && col("id_a") < MegaBase, 1L)),
        lit(0L)).as("neg_found"),
      coalesce(sum(when(col("id_a") >= MegaBase, 1L)), lit(0L))
        .as("mega_found"))
      .crossJoin(stats.select(col("capped_buckets")))
      .crossJoin(plantedCap)
      .select(
        col("pos_found"), col("pos_exact"), col("pos_id_checksum"),
        (col("__mid_found") >= midFloor).cast("long").as("mid_floor_ok"),
        col("neg_found"), col("mega_found"),
        (col("capped_buckets") >= 4L).cast("long").as("cap_floor_ok"),
        col("planted_capped_buckets"), col("planted_dropped_rows"))
  }

  private def tx52(spark: SparkSession, dir: String): DataFrame = {
    val k = scaleOf(spark, dir)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .unionByName(plantedDocs(spark, k))
    tx52Report(spark, docs, k)
  }

  // Pure arithmetic over the plant layout: K positives found at
  // J exactly 1.0 with the closed-form id-sum
  // Σ_g (2·PosBase + 4g + 1) = 2K·PosBase + 2K(K−1) + K; zero
  // negatives and zero mega pairs; the cap fired on AT LEAST the 4
  // mega band buckets (floor boolean — the total may legitimately
  // grow if the organic corpus ever caps a bucket of its own) with
  // the PLANTED share cell-exact: 4 buckets, 4·1200 rows; and the mid
  // floor boolean (engine-measured recall ≥ 0.75 on J = 27/29 pairs —
  // expected ≈ 0.996 from the band S-curve, deterministic per
  // fixture).
  private val tx52Oracle =
    """WITH p AS (SELECT GREATEST(COUNT(*) // 100, 1) AS k FROM documents)
      |SELECT
      |  CAST(k AS BIGINT) AS pos_found,
      |  CAST(k AS BIGINT) AS pos_exact,
      |  CAST(2 * k * 1000000000 + 2 * k * (k - 1) + k AS BIGINT)
      |    AS pos_id_checksum,
      |  CAST(1 AS BIGINT) AS mid_floor_ok,
      |  CAST(0 AS BIGINT) AS neg_found,
      |  CAST(0 AS BIGINT) AS mega_found,
      |  CAST(1 AS BIGINT) AS cap_floor_ok,
      |  CAST(4 AS BIGINT) AS planted_capped_buckets,
      |  CAST(4800 AS BIGINT) AS planted_dropped_rows
      |FROM p""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("tx52_planted_neardup", tx52, Some(tx52Oracle)))
}

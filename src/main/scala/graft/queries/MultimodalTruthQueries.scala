package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sources.Tables

/**
 * PLANTED-TRUTH gate for the perceptual image dedup path — the
 * [[DedupTruthQueries]]/[[SimilarityTruthQueries]] playbook applied to
 * the multimodal family, which until r19 measured retrieval quality
 * only against base-tier oracles (mm09's reference-aHash pair oracle
 * cannot scale past the 10× tier, so corpus100 only TIMED the Hamming
 * path — recall at the decade was unmeasured, exactly the pre-sim24
 * state the text families fixed in r17/r18).
 *
 * mm21 runs the REAL operators — [[Multimodal.imageHashes]]' decode
 * pass and [[Dedup.hammingNearDupsAuto]]'s grouped-band pair search,
 * production radius maxHamming = 6 — over the ORGANIC image corpus
 * unioned with gadget images whose pairwise aHash Hamming distances
 * are EXACT by construction ([[Multimodal.renderPatternPng]]: at 8×8
 * every aHash cell is one black/white pixel, so the decoded hash
 * equals the pattern bit for bit). Per gadget g, four images:
 *
 *   A  = P_g                 (the anchor pattern)
 *   V2 = P_g ⊕ bits{0,1}     d(A,V2) = 2
 *   V6 = P_g ⊕ bits{0..5}    d(A,V6) = 6   — the radius BOUNDARY
 *   V8 = P_g ⊕ bits{0..7}    d(A,V8) = 8   — just past it
 *
 * whose full pairwise census at radius 6 is closed-form: exactly five
 * pairs — (A,V2)=2, (V6,V8)=2, (V2,V6)=4, (A,V6)=6, (V2,V8)=6 — and
 * one absence, (A,V8)=8. Because the grouped-band index is EXHAUSTIVE
 * (pigeonhole candidates + exact Hamming verify, spec-proven at both
 * band counts), the planted census gates CELL-EXACT — recall here is
 * a certainty, not an S-curve floor, so any future banding change
 * that loses pairs (or a cap that starts dropping them silently)
 * fails loudly; the d = 6-in / d = 8-out pair is the standing radius
 * witness.
 *
 * Contamination is impossible by construction, not by luck:
 *  - anchors are even-parity bytes repeated 8× (P_g = b_g ·
 *    0x0101010101010101), so distinct anchors differ ≥ 2 bits PER
 *    BYTE = ≥ 16 bits, and variants perturb byte 0 only — members of
 *    different gadgets keep ≥ 14 bits (7 untouched bytes × ≥ 2) of
 *    separation, far past the radius;
 *  - popcounts stay in [8, 56], so the 1..63 white-pixel window that
 *    makes the decoded hash exact always holds;
 *  - gadget ids start at 10⁹, above any organic media id at any tier,
 *    and every pinned cell filters id_a ≥ 10⁹ (pairs are ordered), so
 *    organic-organic pairs never touch a pin. An organic aHash landing
 *    within 6 bits of a gadget would surface as id_a < 10⁹ and is
 *    likewise excluded; the chance is ~2⁻³⁷ per cross pair and a
 *    fixture regeneration hitting it would be triaged as a fixture
 *    artifact (the tx52 collision-note convention).
 *
 * The oracle is O(1) arithmetic over one `documents` COUNT (the
 * gadget count scales as images/100, capped at 126 — the even-parity
 * byte supply; the cap binds from the 10× tier up and the closed form
 * carries it), so the gate runs at EVERY tier including corpus100,
 * where the engine side decodes ~170k organic images and pair-searches
 * ~170k fingerprints through the same adaptive banding mm09 is timed
 * on.
 */
object MultimodalTruthQueries {

  /** Gadget ids: A, V2, V6, V8 at PlantBase + 4g + {0,1,2,3} — above
    * any organic media id at any tier (corpus100 tops out ~5·10⁵). */
  private[queries] val PlantBase = 1000000000L

  /** The even-parity bytes (excluding 0x00 and 0xFF): pairwise XOR
    * popcount ≥ 2, the per-byte separation floor the scaladoc's ≥ 14
    * cross-gadget bound stands on. 126 values = the gadget supply. */
  private[queries] val ParityBytes: Array[Long] =
    (1 to 254).filter(b => Integer.bitCount(b) % 2 == 0).map(_.toLong).toArray

  /** Anchor pattern for gadget g: its parity byte repeated 8×. */
  private[queries] def anchorPattern(g: Int): Long =
    ParityBytes(g) * 0x0101010101010101L

  /** The four member patterns of gadget g, in id order A, V2, V6, V8. */
  private[queries] def memberPatterns(g: Int): Seq[Long] = {
    val a = anchorPattern(g)
    Seq(a, a ^ 0x3L, a ^ 0x3fL, a ^ 0xffL)
  }

  /** Gadget count: images/100 floored at 1, capped at the 126-byte
    * supply (binds from the 10× tier up — documented, not silent: the
    * oracle's closed form carries the same LEAST). */
  private[queries] def scaleOf(spark: SparkSession, dir: String): Int =
    math.min(126L, math.max(
      Tables.documents(spark, dir).filter(col("doc_id") % 3 === 0).count() / 100L,
      1L)).toInt

  /** The planted media rows for `k` gadgets — rendered on executors,
    * same MediaRow shape the organic image table carries. */
  private[queries] def plantedMedia(spark: SparkSession,
                                    k: Int): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    spark.range(k).flatMap { g =>
      memberPatterns(g.toInt).zipWithIndex.map { case (p, i) =>
        Multimodal.MediaRow(PlantBase + g * 4 + i, "image",
          Multimodal.renderPatternPng(p), 8, 8, 0)
      }
    }
  }

  /** The gadget census over an already-built media frame — factored
    * out so the spec can run it on a fixture-sized corpus. */
  private[queries] def mm21Report(media: DataFrame): DataFrame = {
    val pairs = Dedup.hammingNearDupsAuto(
      Multimodal.imageHashes(media).withColumnRenamed("ahash", "sh"),
      maxHamming = 6)
    pairs.filter(col("id_a") >= PlantBase).agg(
      coalesce(count(lit(1)), lit(0L)).as("found_total"),
      coalesce(sum(when(col("hamming") === 2, 1L)), lit(0L)).as("h2_found"),
      coalesce(sum(when(col("hamming") === 4, 1L)), lit(0L)).as("h4_found"),
      coalesce(sum(when(col("hamming") === 6, 1L)), lit(0L)).as("h6_found"),
      coalesce(sum(col("hamming").cast("long")), lit(0L)).as("hamming_sum"),
      coalesce(sum(col("id_a") + col("id_b")), lit(0L)).as("id_checksum"))
  }

  private def mm21(spark: SparkSession, dir: String): DataFrame = {
    val k = scaleOf(spark, dir)
    val organic = Multimodal.mediaWithRealImages(Tables.documents(spark, dir))
      .filter(col("kind") === "image")
    mm21Report(organic.unionByName(plantedMedia(spark, k).toDF()))
  }

  // Pure arithmetic over the plant layout: 5 pairs per gadget (two at
  // d=2, one at d=4, two at d=6 — the radius boundary held), Hamming
  // mass 20k, and the id checksum
  //   Σ_g [ (A+V2) + (A+V6) + (V2+V6) + (V2+V8) + (V6+V8) ]
  //     = Σ_g (10·PlantBase + 40g + 15) = 10k·PB + 20k(k−1) + 15k
  // (ids A..V8 = PB + 4g + 0..3; found pairs use offsets
  // {0,1},{0,2},{1,2},{1,3},{2,3} → per-g id-offset sum 15, base sum
  // 10·(PB + 4g)).
  // (PlantBase is interpolated, not duplicated as a literal, so the
  // constant and the SQL cannot drift apart)
  private val mm21Oracle =
    s"""WITH c AS (
      |  SELECT LEAST(126, GREATEST(COUNT(*) // 100, 1)) AS k
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT
      |  CAST(5 * k AS BIGINT) AS found_total,
      |  CAST(2 * k AS BIGINT) AS h2_found,
      |  CAST(k AS BIGINT) AS h4_found,
      |  CAST(2 * k AS BIGINT) AS h6_found,
      |  CAST(20 * k AS BIGINT) AS hamming_sum,
      |  CAST(10 * k * $PlantBase + 20 * k * (k - 1) + 15 * k AS BIGINT)
      |    AS id_checksum
      |FROM c""".stripMargin

  // ---- mm22: planted-truth VIDEO near-dup census — the same treatment
  //      for mm15's frame-hash-set Jaccard path, whose oracle (decode-
  //      derived hash literals) cannot scale past the 10× tier. Per
  //      gadget, four REAL GIFs of the same footage rendered at trim
  //      depths 0/1/2/3 of a 4-frame base (renderGif's startFrame form,
  //      the exact construction the organic trimmed-variant population
  //      uses), so the distinct-frame-set relations are known by
  //      construction and the pair census at minJaccard = 0.5 is
  //      closed-form:
  //        A(4 frames)–B(3): 3/4   ✓    A–D(2): 2/4 = 0.5 ✓ BOUNDARY
  //        B–D: 2/3 ✓               D–E(1): 1/2 = 0.5 ✓ BOUNDARY
  //        A–E: 1/4 ✗  B–E: 1/3 ✗  — both MEET in the inverted index
  //                                   (shared frame 3) and must be
  //                                   killed by the Jaccard verify
  //      Four pairs per gadget with exact (n_shared, n_a, n_b), two of
  //      them at Jaccard exactly 0.5 (0.5 and 0.75 are dyadic — exact
  //      in double), so the inclusive-boundary witness is cell-exact.
  //      The inverted-index plan is exhaustive (videos sharing a frame
  //      always meet), so like mm21 the census is a certainty, not a
  //      floor. The closed form assumes the LCG frame generator never
  //      collides two distinct (seed, frame) contents — a fixture
  //      regeneration hitting that ~2⁻⁶⁴ event shifts a count by one
  //      and is triaged as a fixture artifact (the tx52 convention).
  //      Gadget ids start at 2·10⁹, above the organic trim variants'
  //      TrimVariantOffset range (~10⁹ + 5·10⁵ at corpus100).
  private[queries] val VideoPlantBase = 2000000000L

  /** The four trim-depth members of video gadget g, ids A,B,D,E =
    * base + 4g + {0,1,2,3} — REAL GIF payloads of shared footage. */
  private[queries] def plantedVideos(spark: SparkSession,
                                     k: Int): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    spark.range(k).flatMap { g =>
      val seed = VideoPlantBase + g * 4
      (0 until 4).map(s =>
        Multimodal.MediaRow(seed + s, "video",
          Multimodal.renderGif(seed, 8, 8, 4, s), 8, 8, 0))
    }
  }

  /** Gadget count: videos/100 floored at 1 (no supply cap — seeds are
    * unbounded; 10 decoded frames per gadget keep the plant linear). */
  private[queries] def videoScaleOf(spark: SparkSession, dir: String): Int =
    math.max(
      Tables.documents(spark, dir).filter(col("doc_id") % 3 === 2).count() / 100L,
      1L).toInt

  /** The gadget census over an already-built media frame — factored
    * out for the spec. */
  private[queries] def mm22Report(media: DataFrame): DataFrame =
    Multimodal.videoNearDups(media, minJaccard = 0.5)
      .filter(col("id_a") >= VideoPlantBase).agg(
        coalesce(count(lit(1)), lit(0L)).as("found_total"),
        coalesce(sum(when(col("n_shared") === 3 && col("n_a") === 4 &&
          col("n_b") === 3, 1L)), lit(0L)).as("trim1_found"),
        coalesce(sum(when(col("n_shared") === 2 && col("n_a") === 4 &&
          col("n_b") === 2, 1L)), lit(0L)).as("trim2_boundary_found"),
        coalesce(sum(when(col("n_shared") === 2 && col("n_a") === 3 &&
          col("n_b") === 2, 1L)), lit(0L)).as("mid_trims_found"),
        coalesce(sum(when(col("n_shared") === 1 && col("n_a") === 2 &&
          col("n_b") === 1, 1L)), lit(0L)).as("deep_boundary_found"),
        coalesce(sum(when(col("jaccard") === 0.5, 1L)), lit(0L))
          .as("at_boundary_found"),
        coalesce(sum(col("id_a") + col("id_b")), lit(0L)).as("id_checksum"))

  private def mm22(spark: SparkSession, dir: String): DataFrame = {
    val k = videoScaleOf(spark, dir)
    val organic = Multimodal.mediaWithTrimmedVideos(Tables.documents(spark, dir))
    mm22Report(organic.unionByName(plantedVideos(spark, k).toDF()))
  }

  // Closed form: 4 pairs per gadget, one per (n_shared, n_a, n_b)
  // shape, two at Jaccard exactly 0.5; id checksum over found-pair
  // offsets {0,1},{0,2},{1,2},{2,3} of base + 4g:
  //   Σ_g (8·(PB + 4g) + 11) = 8k·PB + 16k(k−1) + 11k
  private val mm22Oracle =
    s"""WITH c AS (
      |  SELECT GREATEST(COUNT(*) // 100, 1) AS k
      |  FROM documents WHERE doc_id % 3 = 2)
      |SELECT
      |  CAST(4 * k AS BIGINT) AS found_total,
      |  CAST(k AS BIGINT) AS trim1_found,
      |  CAST(k AS BIGINT) AS trim2_boundary_found,
      |  CAST(k AS BIGINT) AS mid_trims_found,
      |  CAST(k AS BIGINT) AS deep_boundary_found,
      |  CAST(2 * k AS BIGINT) AS at_boundary_found,
      |  CAST(8 * k * $VideoPlantBase + 16 * k * (k - 1) + 11 * k AS BIGINT)
      |    AS id_checksum
      |FROM c""".stripMargin

  // ---- mm23: planted-truth media-ANN census — the sim23/sim24
  //      playbook applied to mm02's retrieval path, possible only after
  //      r20 made the media embedding non-degenerate
  //      ([[Multimodal.contentVector]]): a planted top-k floor over the
  //      old size-dominated vectors would have measured tie-breaking.
  //      Per gadget g, FOUR solid-color images of the SAME color at
  //      four different sizes (9² … 12²): a solid color's content
  //      vector is a function of (r, g, b) alone, so the four members
  //      decode to bitwise-IDENTICAL vectors — cosine exactly 1 (up to
  //      one ulp in the norm product; rounds to 1.0 at the pipeline's
  //      4 dp) — which is simultaneously the scale-invariance claim of
  //      the embedding exercised as a planted certainty ("same content,
  //      re-encoded at another size, retrieves itself"). Queries are
  //      the gadget anchors; the true top-3 of each is its three
  //      siblings, and the census is closed-form:
  //        found_total = sibling_hits = at_unit = 3k,
  //        organic_intruders = 0,
  //        id_checksum = Σ_g [3·(B+4g) + Σ_{i=1..3}(B+4g+i)]
  //                    = 6k·B + 12k(k−1) + 6k.
  //      Separation is engineered AND measured: gadget colors come from
  //      a deterministic greedy pass over the 5³ channel grid keeping
  //      pairwise content-cosine ≤ 0.98 (supply = 71, spec-pinned), so
  //      no cross-gadget pair can reach the 0.99995 rounding boundary;
  //      organic LCG images (channel means ≈ 0.5, near-uniform luma
  //      histogram) sit ≈ 0.85 from every gadget direction, and the
  //      census MEASURES the claim — any organic or cross-gadget
  //      vector outranking a sibling drops sibling_hits / raises
  //      organic_intruders and fails the cell compare. An organic
  //      content vector landing within 5e-5 of a gadget direction
  //      would be triaged as a fixture artifact (the tx52 convention).
  //      The exact brute-force path is EXHAUSTIVE, so like mm21/mm22
  //      this gates cell-exact at every tier including corpus100 —
  //      where retrieval quality for media was previously unmeasured.
  private[queries] val MediaAnnPlantBase = 3000000000L

  /** Gadget color supply: deterministic greedy over the
    * {0,64,128,192,255}³ grid (r-major order), keeping a color iff its
    * content-vector cosine to every kept color is ≤ 0.98. 71 colors —
    * pinned here and by spec, and carried by the oracle's closed form. */
  private[queries] val GadgetColors: Seq[(Int, Int, Int)] = {
    def content(r: Int, g: Int, b: Int): Array[Double] = {
      val v = new Array[Double](13)
      v(0) = r / 255.0; v(1) = g / 255.0; v(2) = b / 255.0
      v(3 + ((r * 299 + g * 587 + b * 114) / 1000) * 10 / 256) = 1.0
      v
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    val grid = Seq(0, 64, 128, 192, 255)
    val kept = scala.collection.mutable.ArrayBuffer.empty[((Int, Int, Int), Array[Double])]
    for (r <- grid; g <- grid; b <- grid) {
      val v = content(r, g, b)
      if (kept.forall { case (_, w) => cos(v, w) <= 0.98 })
        kept += (((r, g, b), v))
    }
    val colors = kept.map(_._1).toSeq
    require(colors.size == 71, s"gadget color supply drifted: ${colors.size}")
    colors
  }

  /** The four same-color members of media-ANN gadget g, ids
    * base + 4g + {0,1,2,3}, rendered at sizes 9²..12² — REAL PNGs whose
    * decoded content vectors are bitwise identical. */
  private[queries] def plantedSolidMedia(spark: SparkSession,
                                         k: Int): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    spark.range(k).flatMap { g =>
      val (r, gg, b) = GadgetColors(g.toInt)
      (0 until 4).map { i =>
        val s = 9 + i
        Multimodal.MediaRow(MediaAnnPlantBase + g * 4 + i, "image",
          Multimodal.renderSolidPng(r, gg, b, s, s), s, s, 0)
      }
    }
  }

  /** Gadget count: images/100 floored at 1, capped at the 71-color
    * supply (binds from the sf0.1 tier up — documented, not silent:
    * the oracle's closed form carries the same LEAST). */
  private[queries] def annScaleOf(spark: SparkSession, dir: String): Int =
    math.min(GadgetColors.size.toLong, math.max(
      Tables.documents(spark, dir).filter(col("doc_id") % 3 === 0).count() / 100L,
      1L)).toInt

  /** The gadget census over an already-built CONTENT-vector frame —
    * factored out for the spec. `cvecs` must carry (media_id, cvec)
    * for organic + planted rows together. */
  private[queries] def mm23Report(cvecs: DataFrame): DataFrame = {
    val base = MediaAnnPlantBase
    val vecs = cvecs.select(col("media_id").as("id"), col("cvec").as("vec"))
    val queries = vecs.filter(
      col("id") >= base && (col("id") - base) % 4 === 0)
    val top = graft.similarity.Similarity.bruteForceTopK(vecs, queries, k = 3)
    top.agg(
      coalesce(count(lit(1)), lit(0L)).as("found_total"),
      // gadget index = (id - base) / 4 as INTEGER floor-division via a
      // bit shift — exact by construction at any plant base/stride
      // (r21; the former Column.divide ran double division + truncate,
      // exact only while offsets stayed under 2^52). Non-negative on
      // both sides: cand_id is guarded here, query_id by the filter.
      coalesce(sum(when(col("cand_id") >= base &&
        shiftright(col("cand_id") - base, 2) ===
          shiftright(col("query_id") - base, 2), 1L)), lit(0L))
        .as("sibling_hits"),
      coalesce(sum(when(col("cosine") === 1.0, 1L)), lit(0L)).as("at_unit"),
      coalesce(sum(when(col("cand_id") < base, 1L)), lit(0L))
        .as("organic_intruders"),
      coalesce(sum(col("query_id") + col("cand_id")), lit(0L)).as("id_checksum"))
  }

  private def mm23(spark: SparkSession, dir: String): DataFrame = {
    val k = annScaleOf(spark, dir)
    val organic = Multimodal.contentFeatures(
      MultimodalQueries.features(spark, dir))
    val planted = Multimodal.contentFeatures(
      Multimodal.extractFeatures(
        plantedSolidMedia(spark, k).toDF(), Multimodal.ImageIoDecoder).toDF())
    mm23Report(organic.unionByName(planted))
  }

  // Closed form over the plant layout (see the mm23 comment): 3 found
  // rows per gadget, all siblings, all at rounded cosine 1.0, none
  // organic; checksum 6k·B + 12k(k−1) + 6k with B interpolated.
  private val mm23Oracle =
    s"""WITH c AS (
      |  SELECT LEAST(71, GREATEST(COUNT(*) // 100, 1)) AS k
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT
      |  CAST(3 * k AS BIGINT) AS found_total,
      |  CAST(3 * k AS BIGINT) AS sibling_hits,
      |  CAST(3 * k AS BIGINT) AS at_unit,
      |  CAST(0 AS BIGINT) AS organic_intruders,
      |  CAST(6 * k * $MediaAnnPlantBase + 12 * k * (k - 1) + 6 * k AS BIGINT)
      |    AS id_checksum
      |FROM c""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("mm21_planted_image_neardup", mm21, Some(mm21Oracle)),
    GraftQuery("mm22_planted_video_neardup", mm22, Some(mm22Oracle)),
    GraftQuery("mm23_planted_media_ann", mm23, Some(mm23Oracle)))
}

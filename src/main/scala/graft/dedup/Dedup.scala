package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.TextAnalysis

/**
 * Document deduplication for web-scale corpora: exact (hash-groupBy),
 * MinHash+LSH banding (near-dup candidate generation sub-quadratically),
 * n-gram Jaccard verification, and SimHash.
 *
 * Scale design: every stage is expressed as native array/hash
 * expressions plus hash shuffles keyed on short values (16-byte
 * fingerprints, 8-byte band hashes) — full document text never shuffles
 * except once to fetch shingle sets for candidate verification. The
 * all-pairs comparison is avoided entirely: LSH banding restricts the
 * join to same-bucket documents, so cost is O(Σ bucket²) with bucket
 * sizes controlled by the band width.
 */
object Dedup {

  /** Exact dedup: group documents by content fingerprint, keep the
    * lowest id as the canonical representative. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper"))

  /** Token n-gram shingles (w-word windows) as an array column. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    // slide a w-window over the token array; empty when < w tokens
    filter(
      transform(toks, (_, i) => concat_ws(" ", slice(toks, i + 1, lit(w)))),
      s => size(split(s, " ")) === w)
  }

  /** Distinct shingle set (Jaccard works on sets). */
  def shingleSet(text: Column, w: Int = 3): Column = array_distinct(shingles(text, w))

  /**
   * MinHash signature: for each of `k` seeded hash functions, the
   * minimum xxhash64 over the shingle set. Pure per-row expression —
   * no shuffle, no UDF.
   */
  def minHashSignature(shingleSet: Column, k: Int = 16): Column =
    array((0 until k).map(s =>
      array_min(transform(shingleSet, x => xxhash64(lit(s), x)))): _*)

  /**
   * LSH band keys: the signature split into `bands` contiguous rows of
   * `rowsPerBand`, each band hashed to one 64-bit key. Two documents
   * collide in a band iff that band's minhashes all agree, so the
   * candidate-pair probability is 1-(1-j^r)^b — a sharp threshold
   * around (1/b)^(1/r).
   */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(slice(signature, b * rowsPerBand + 1, rowsPerBand)).as("band_hash"))
    }: _*)

  /** Exact Jaccard similarity of two shingle-set arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /**
   * Near-duplicate pairs via MinHash LSH + exact Jaccard verification.
   *
   * Plan shape: docs → (id, shingleSet, signature) [map-only] →
   * explode bands [map-only] → self-join on (band, band_hash) [one hash
   * shuffle on 8-byte keys] → distinct candidate pairs → verify with
   * exact Jaccard on the shingle sets carried through the join.
   * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ minJaccard.
   */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   minJaccard: Double = 0.7, k: Int = 16,
                   bands: Int = 4, shingleWidth: Int = 3): DataFrame = {
    val rowsPerBand = k / bands
    val prepared = docs
      .select(col(idCol).as("id"), shingleSet(col(textCol), shingleWidth).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minHashSignature(col("sh"), k))
      .withColumn("bk", explode(bandKeys(col("sig"), bands, rowsPerBand)))
      .select(col("id"), col("sh"),
        col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))

    val a = prepared.select(col("id").as("id_a"), col("sh").as("sh_a"),
      col("band"), col("band_hash"))
    val b = prepared.select(col("id").as("id_b"), col("sh").as("sh_b"),
      col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("jaccard")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /**
   * 64-bit SimHash from the token multiset: each token votes ±1 on each
   * bit position of its xxhash64; the sign of the per-bit sum is the
   * fingerprint bit. Near-duplicates have small Hamming distance.
   * Built from higher-order array expressions (fold over 64 bit
   * positions) — map-only, codegen-friendly, no UDF.
   */
  def simHash64(text: Column): Column = {
    val hashes = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    val bitExprs = (0 until 64).map { bit =>
      // sum over tokens of bit_i(hash)*2-1; >0 → bit set
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, bit).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)))
      when(votes > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    bitExprs.reduce(_ bitwiseOR _)
  }
}

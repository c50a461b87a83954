package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

/**
 * A PORTABLE HyperLogLog — registers derived from md5 with string and
 * arithmetic ops both Spark and DuckDB implement identically, so the
 * whole sketch (not just its estimate) is cell-exact cross-engine.
 * This is deliberately different from dq02's `approx_count_distinct`
 * contract: Spark's built-in HLL++ is engine-private state (DuckDB
 * cannot recompute it, so dq02 gates a *bound boolean*), while these
 * registers are plain rows — they can be persisted per shard, unioned
 * across days, and MERGED by a `MAX` aggregate, and an independent
 * engine reproduces every register bit-for-bit.
 *
 * That mergeability is the 100 TB point: distinct-count state for an
 * append-only fact table is one (shard, 256-register) table; a new
 * day merges in register-max time, never by rescanning history. The
 * estimator is the raw HLL harmonic mean (Flajolet et al. 2007,
 * "HyperLogLog: the analysis of a near-optimal cardinality estimation
 * algorithm"): alpha_m * m^2 / sum(2^-M_j). The sum is computed in
 * EXACT integer arithmetic — each term scaled by 2^53, so an empty
 * bucket contributes 2^53 and a saturated one contributes 1, bounded
 * by 256 * 2^53 = 2^61 < 2^63 — and the only floating-point op in the
 * whole pipeline is one final double division of two exactly-agreed
 * numbers (the q54 discipline: identical IEEE op, identical inputs).
 * The small-range linear-counting correction is deliberately omitted:
 * it needs a natural log, whose last-ulp behavior the two engines do
 * not contract about; the raw estimator keeps the gate exact.
 *
 * Hash layout per key k: h = md5("hll:" || k), 32 lowercase hex chars.
 *  - bucket = int(h[0..1])            (p = 8 -> m = 256 buckets)
 *  - rank   = leading-zero count of the 52-bit tail h[2..14] plus 1,
 *             capped at 53 when the tail is all zeros.
 * Leading zeros come from string ops (strip leading '0' chars, then a
 * 15-way CASE on the first surviving nibble) rather than integer
 * bit-tricks, because both engines agree exactly on md5 hex, substr,
 * regexp_replace and CASE — and on nothing about 64-bit overflow.
 */
object Hll {

  /** Number of register index bits (m = 2^P buckets). */
  val P = 8

  /** Register count. */
  val M: Int = 1 << P

  /** Rank cap: 52 tail bits all zero -> rank 53. */
  val RankCap = 53

  /** alpha_256 (Flajolet's bias constant for m >= 128). */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

  /** The whole estimator numerator folded into ONE double constant:
    * alpha_m * m^2 * 2^53 (the 2^53 cancels the integer scaling of
    * the harmonic-mean denominator). Estimate = this / sum_inv_scaled
    * in a single IEEE division. */
  val EstimatorConst: Double = Alpha * M.toDouble * M.toDouble * (1L << RankCap).toDouble

  /** [[EstimatorConst]] rendered so a SQL parser reconstructs the
    * identical IEEE double (%.17g round-trips binary64). */
  val EstimatorConstLiteral: String =
    String.format(java.util.Locale.ROOT, "%.17g", Double.box(EstimatorConst))

  /** Published relative standard deviation of the raw estimator:
    * 1.04 / sqrt(m) = 6.5% at m = 256. */
  val Rsd: Double = 1.04 / math.sqrt(M.toDouble)

  /** The raw estimator's DOMAIN FLOOR: below ~2.5·m distinct keys
    * (640 at m = 256) the raw harmonic mean is known-biased and
    * Flajolet's analysis prescribes switching to linear counting —
    * which this sketch deliberately omits (it needs a natural log the
    * two engines don't contract about). Accuracy claims
    * ([[Bound3Rsd]], dq23/st32's `within_3rsd`) are therefore only
    * meaningful for cardinalities AT OR ABOVE this floor;
    * SketchFixtureSpec asserts the gate fixtures sit above it and
    * that the booleans are actually true there, so a fixture drifting
    * into the biased domain fails loudly instead of gating a
    * silently-agreed false. */
  val MinCardinalityDomain: Long = (5L * M) / 2

  /** The accuracy gate bound: 3 sigma of [[Rsd]] (the dq02 practical
    * hard bound; the sf0.01 fixture's event_id draw sits at 2.6 sigma
    * low — an honest single-draw outcome, inside this bound). */
  val Bound3Rsd: Double = 3 * Rsd

  /** [[Bound3Rsd]] as a round-trip-exact SQL literal. */
  val Bound3RsdLiteral: String =
    String.format(java.util.Locale.ROOT, "%.17g", Double.box(Bound3Rsd))

  /** md5-hex hash of a key column under the sketch's domain prefix. */
  def hashHex(key: Column): Column =
    md5(concat(lit("hll:"), key.cast(StringType)))

  /** Register index: first two hex chars as an int in [0, 255]. */
  def bucketOf(hashHex: Column): Column =
    conv(substring(hashHex, 1, 2), 16, 10).cast(IntegerType)

  /** Rank (leading-zero count + 1) of the 52-bit tail, in [1, 53]. */
  def rankOf(hashHex: Column): Column = {
    val stripped = regexp_replace(substring(hashHex, 3, 13), "^0+", "")
    val nib = substring(stripped, 1, 1)
    val lzNib = when(nib.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
      .when(nib.isin("4", "5", "6", "7"), 1)
      .when(nib.isin("2", "3"), 2)
      .otherwise(3)
    when(length(stripped) === 0, lit(RankCap))
      .otherwise((lit(13) - length(stripped)) * 4 + lzNib + 1)
      .cast(IntegerType)
  }

  /** The same rank computation as [[rankOf]] in portable SQL, over a
    * hex-string column expression. */
  def rankSql(hexExpr: String): String = {
    val st = s"regexp_replace(substr($hexExpr, 3, 13), '^0+', '')"
    s"""CAST(CASE WHEN length($st) = 0 THEN $RankCap
       |  ELSE (13 - length($st)) * 4 +
       |    CASE WHEN substr($st, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 0
       |         WHEN substr($st, 1, 1) IN ('4','5','6','7') THEN 1
       |         WHEN substr($st, 1, 1) IN ('2','3') THEN 2 ELSE 3 END + 1
       |  END AS INTEGER)""".stripMargin
  }
}

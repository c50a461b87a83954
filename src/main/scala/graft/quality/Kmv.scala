package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/**
 * A PORTABLE bottom-k (KMV, "k minimum values") sketch — the third
 * member of the mergeable-sketch family and the one that answers SET
 * ALGEBRA questions the other two cannot: [[Hll]] estimates a single
 * set's cardinality and cannot intersect, [[Cms]] estimates per-key
 * frequency; a bottom-k signature supports UNION (merge two
 * signatures, keep the k smallest — an associative, fold-order-free
 * min-union) and from the union signature both the union cardinality
 * and the Jaccard/intersection estimates (Bar-Yossef et al. 2002,
 * "Counting distinct elements in a data stream"; Beyer et al. 2007,
 * "On synopses for distinct-value estimation under multiset
 * operations").
 *
 * The pipeline question is audience/cohort overlap at warehouse
 * scale: "how many users active in window A were also active in
 * window B" across shards that were sketched independently — without
 * ever co-scanning the two windows. Estimators:
 *   |U| ≈ (k-1) * 2^52 / kth_min(U)           (union cardinality)
 *   J(A,B) ≈ |{v ∈ bottomK(U) : v ∈ A ∧ v ∈ B}| / k
 *   |A ∩ B| ≈ J * |U|
 * Hash values are the first 13 hex chars of md5 ("kmv:" prefix) read
 * as a 52-bit integer — exactly representable in BIGINT and in IEEE
 * double, and derivable by both engines from string ops alone, so
 * the signatures themselves gate cell-exactly; the estimates are
 * fixed expression trees over exactly-agreed integers.
 */
object Kmv {

  /** Signature size (the accuracy knob; rse ~ 1/sqrt(k-2)). */
  val K = 32

  /** Hash-space size: 13 hex chars = 52 bits. */
  val SpaceBits = 52

  /** (K-1) * 2^52 — the union-estimator numerator as one double
    * constant (exact: both factors are powers-of-two-scaled ints far
    * below 2^63). */
  val EstimatorConst: Double = (K - 1).toDouble * (1L << SpaceBits).toDouble

  /** [[EstimatorConst]] as a round-trip-exact SQL literal. */
  val EstimatorConstLiteral: String =
    String.format(java.util.Locale.ROOT, "%.17g", Double.box(EstimatorConst))

  /** Union-cardinality estimate from a (possibly UNSATURATED) union
    * signature. When `kUsed < K` the bottom-k signature IS the entire
    * hashed union set — no k-th order statistic exists to extrapolate
    * from, and the standard (K-1)·2^52/kth formula misestimates badly
    * (its numerator assumes a full signature). The estimate there is
    * exactly `kUsed`, which is the exact union cardinality (modulo
    * 52-bit hash collisions). Both branches are engine-exact: the
    * comparison is on an integer, the unsaturated branch is a small
    * int cast, the saturated branch one IEEE division of
    * exactly-agreed numbers. Downstream estimators inherit the fix
    * for free: intersection = shared·est/kUsed degrades to `shared` —
    * the exact intersection — when unsaturated. */
  def unionEstimate(kUsed: Column, kthMin: Column): Column =
    when(kUsed < K, kUsed.cast("double"))
      .otherwise(lit(EstimatorConst) / kthMin.cast("double"))

  /** [[unionEstimate]] in DuckDB SQL, branch for branch. */
  def unionEstimateSql(kUsedExpr: String, kthMinExpr: String): String =
    s"""CASE WHEN $kUsedExpr < $K THEN CAST($kUsedExpr AS DOUBLE)
       |  ELSE $EstimatorConstLiteral / CAST($kthMinExpr AS DOUBLE) END""".stripMargin

  /** The 52-bit hash value of a key column. */
  def valueOf(key: Column): Column =
    conv(substring(md5(concat(lit("kmv:"), key.cast(StringType))), 1, 13),
      16, 10).cast(LongType)

  /** The same hash value in DuckDB SQL. */
  def valueSql(keyExpr: String): String =
    s"CAST(('0x' || substr(md5('kmv:' || CAST($keyExpr AS VARCHAR)), 1, 13)) AS BIGINT)"
}

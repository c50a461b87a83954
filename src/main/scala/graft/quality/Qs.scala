package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/**
 * A PORTABLE bottom-k row-sample QUANTILE sketch — the fourth member
 * of the mergeable-sketch family, answering the question the other
 * three cannot: [[Hll]] gives cardinality, [[Cms]] per-key frequency,
 * [[Kmv]] set algebra; this gives value DISTRIBUTION (p50/p90/p99)
 * from shard-local state that merges without rescanning history.
 *
 * The construction is the KMV trick pointed at rows instead of
 * distinct values: hash each row's UNIQUE key into a 52-bit space and
 * keep the K rows with the smallest hashes, carrying their values.
 * Because the hash is a pure function of row identity, the bottom-K
 * of a UNION of shards is exactly the bottom-K of the union of the
 * shards' bottom-Ks — min-union merge, associative and commutative,
 * fold-order-free — and the kept rows are a uniform-without-
 * replacement sample of the whole table (every row's hash rank is
 * exchangeable). Sample order statistics then estimate population
 * quantiles with the standard binomial rank error
 * sd(q) = sqrt(q(1-q)/K) (Chaudhuri, Motwani, Narasayya 1998,
 * "Random sampling for histogram construction"; the bottom-k-as-
 * sample view is Bar-Yossef et al. 2002's coordinated-sampling
 * reading of KMV).
 *
 * The pipeline question: per-month shards each keep a 256-row
 * signature; ops wants "p99 order value, all time" without
 * co-scanning the months. Everything is engine-exact to gate: the
 * signatures are integer hashes plus raw parquet doubles, the
 * quantile pick is an integer rank index (ceil(q*k_used)) into the
 * value-sorted sample, and the accuracy boolean compares the
 * estimate's EXACT rank (one conditional-count scan) against a fixed
 * IEEE expression both engines evaluate identically.
 */
object Qs {

  /** Sample size (the accuracy knob; rank sd = sqrt(q(1-q)/K)). */
  val K = 256

  /** Hash-space size: 13 hex chars = 52 bits (exact in BIGINT and in
    * IEEE double, same space as [[Kmv]]). */
  val SpaceBits = 52

  /** The gated quantiles. */
  val Quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99)

  /** The 52-bit row hash of a unique row key. */
  def hashOf(key: Column): Column =
    conv(substring(md5(concat(lit("qs:"), key.cast(StringType))), 1, 13),
      16, 10).cast(LongType)

  /** The same row hash in DuckDB SQL. */
  def hashSql(keyExpr: String): String =
    s"CAST(('0x' || substr(md5('qs:' || CAST($keyExpr AS VARCHAR)), 1, 13)) AS BIGINT)"

  // Rank-error bound: 3.5 binomial sd plus one sample step (1/K) of
  // discreteness slack. 3.5 sd one-sided miss probability ~2e-4 per
  // quantile — and the fixture draw is FIXED (identity-keyed hash),
  // so the boolean is deterministic; SketchFixtureSpec pins it true.
  // Both engines evaluate the identical IEEE expression tree (sqrt is
  // correctly rounded, 1/K and K are powers of two), so the bound
  // itself is engine-exact.

  /** The rank-error bound as a Spark expression over the quantile. */
  def rankBound(q: Column): Column =
    lit(3.5) * sqrt(q * (lit(1.0) - q) / lit(K.toDouble)) + lit(1.0 / K)

  /** The same bound in DuckDB SQL, operation for operation. */
  def rankBoundSql(qExpr: String): String =
    s"3.5 * sqrt($qExpr * (1.0 - $qExpr) / ${K}.0) + ${1.0 / K}"
}

package graft.quality

/**
 * Single source of truth for the sketch-accuracy contract shared by
 * dq02's in-engine gate booleans ([[graft.queries.QualityQueries]])
 * and the independent re-derivation in `SketchAccuracySpec` — the two
 * halves of the split-verification design must never drift apart on
 * what "within bounds" means.
 *
 * The numbers come from the sketches' published guarantees:
 *  - `approx_count_distinct` is HyperLogLog++ with a default relative
 *    standard deviation of 5%; 2σ (10%) is dq02's production gate,
 *    3σ (15%) the spec's practical hard bound.
 *  - `percentile_approx` with accuracy A guarantees rank error
 *    ≤ n/A; dq02 gates at 2× that guarantee so tie mass on discrete
 *    values can't flip the boolean.
 */
object SketchBounds {
  /** approx_count_distinct default relative standard deviation. */
  val HllRsd: Double = 0.05

  /** dq02's production gate: 2σ of the HLL rsd. */
  val Hll2Rsd: Double = 2 * HllRsd

  /** Spec-side practical hard bound: 3σ of the HLL rsd. */
  val Hll3Rsd: Double = 3 * HllRsd

  /** percentile_approx accuracy parameter (rank error ≤ n/this). */
  val PercentileAccuracy: Int = 1000

  /** dq02's rank epsilon: 2× the n/accuracy guarantee. */
  val RankEps: Double = 2.0 / PercentileAccuracy
}

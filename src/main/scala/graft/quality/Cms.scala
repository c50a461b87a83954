package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

/**
 * A PORTABLE Count-Min sketch (Cormode & Muthukrishnan 2005, "An
 * improved data stream summary: the count-min sketch and its
 * applications") — [[Hll]]'s sibling for the other sketch question:
 * Hll answers "how many DISTINCT keys", this answers "how often THIS
 * key", both in bounded memory over unbounded key domains, both with
 * counters that are plain rows an independent engine reproduces
 * cell-exactly.
 *
 * The pipeline use is the frequency-cap primitive: dedup and mixture
 * stages need "has this domain/user/shingle contributed more than K
 * already?" at 100 TB, where exact per-key state is itself a
 * key-domain-sized table. A d x w counter matrix (here 4 x 64 for the
 * gate fixtures; width is the knob) answers any point query with a
 * deterministic ONE-SIDED error: estimate >= true count always, and
 * the overshoot is bounded by colliding mass (expected (N - n_k)/w
 * per row, min over d rows). Everything is integer counts — there is
 * no floating point anywhere in this sketch.
 *
 * Mergeability is the same story as [[Hll]] but with SUM instead of
 * MAX: day-sharded counter matrices add cell-wise, so history never
 * rescans when a new shard lands, and the merge law is exact integer
 * associativity (gated, not assumed).
 *
 * Row hashes come from md5 over a row-tagged key rendering
 * (`"cms:" || r || ":" || key`), first 4 hex chars mod w — the same
 * both-engines-agree string arithmetic as [[Hll]]'s registers.
 */
object Cms {

  /** Depth: independent hash rows (estimate = min across them). */
  val D = 4

  /** Width: counters per row (the accuracy knob; overshoot ~ N/w). */
  val W = 64

  /** Counter column for `key` in hash row `row` (both int columns). */
  def colOf(row: Column, key: Column): Column =
    pmod(conv(substring(md5(concat(lit("cms:"), row.cast(StringType),
      lit(":"), key.cast(StringType))), 1, 4), 16, 10).cast(IntegerType),
      lit(W))

  /** The same counter-column computation in DuckDB SQL. */
  def colSql(rowExpr: String, keyExpr: String): String =
    s"CAST(('0x' || substr(md5('cms:' || CAST($rowExpr AS VARCHAR) || ':' " +
      s"|| CAST($keyExpr AS VARCHAR)), 1, 4)) AS INTEGER) % $W"
}

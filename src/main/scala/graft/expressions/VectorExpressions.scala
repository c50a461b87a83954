package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native expressions for the vector-search hot path.
 *
 * [[NearestCells]] exists to make IVF cell assignment MAP-ONLY. The
 * declarative formulation — crossJoin a 16-row broadcast centroid
 * table, compute a distance per (row, cell), rank with a window — is
 * correct but pays an exchange and a sort of the 16×-exploded rows
 * per assignment, twice per IVF query (layout side + probe side).
 * Assignment is a pure per-row function of the vector once the
 * quantizer is fitted, so a single expression evaluating all cells in
 * one loop removes both shuffles and both sorts from every IVF plan —
 * the difference between "assignment is a stage" and "assignment is a
 * projection", which at 100 TB is the difference between re-shuffling
 * the corpus and streaming it.
 *
 * Exactness contract (what lets sim05/io03/io04 keep their DuckDB
 * oracles): the distance is the same left-associated sequential fold
 * the oracle SQL renders — `0.0 + (x₁−c₁)² + (x₂−c₂)² + …` — and ties
 * resolve to the lowest cell id, matching the oracle's
 * `ORDER BY dist, cell` row_number. Identical IEEE operations in
 * identical order ⇒ bit-identical assignments.
 */
object VectorExpressions {

  /** The `n` nearest centroid cell ids for a double-array vector, in
    * (distance, cell) order — centroids baked in as literals at plan
    * time (quantizer-sized: nCells × dim doubles, the same payload the
    * crossJoin formulation broadcast). */
  case class NearestCells(child: Expression, centroids: Seq[Array[Double]], n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n > 0 && n <= centroids.size, "need 0 < n <= nCells")

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "nearest_cells"
    override protected def withNewChildInternal(newChild: Expression): NearestCells =
      copy(child = newChild)

    // cells are few (coarse quantizer): selection over a scratch array
    // beats a heap at this size and keeps the tie-break transparent
    override def nullSafeEval(input: Any): Any = {
      val vec = input.asInstanceOf[ArrayData]
      val dim = vec.numElements()
      val k = centroids.size
      val dists = new Array[Double](k)
      var c = 0
      while (c < k) {
        val cent = centroids(c)
        var acc = 0.0
        var j = 0
        while (j < dim && j < cent.length) {
          val d = vec.getDouble(j) - cent(j)
          acc += d * d
          j += 1
        }
        dists(c) = acc
        c += 1
      }
      val out = new Array[Int](n)
      val taken = new Array[Boolean](k)
      var r = 0
      while (r < n) {
        var best = -1
        var bestDist = Double.PositiveInfinity
        c = 0
        while (c < k) {
          // strict < : ties keep the earlier (lower) cell — the
          // oracle's ORDER BY dist, cell
          if (!taken(c) && dists(c) < bestDist) { best = c; bestDist = dists(c) }
          c += 1
        }
        taken(best) = true
        out(r) = best
        r += 1
      }
      new GenericArrayData(out)
    }
  }

  def nearestCells(vec: Column, centroids: Seq[Array[Double]], n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NearestCells(org.apache.spark.sql.GraftColumnBridge.expression(vec), centroids, n))
}

package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/**
 * The engine's one WHOLE-OPERATOR Catalyst extension, demonstrating
 * preference path (c) end-to-end: a custom `LogicalPlan` node planned
 * by a custom `SparkStrategy`, surfaced through the public Dataset
 * API. The as-of join is the natural candidate — Spark has no
 * relational operator for it, and [[graft.ops.Relational.asOfJoin]]
 * already proved the composed union/window lowering correct (q19's
 * DuckDB `ASOF JOIN` oracle) — so the node buys DECLARATIVE value:
 * callers get one logical operator Catalyst can see (column pruning
 * reaches THROUGH it into the right side, because the node declares
 * exactly which attributes it references), and the physical plan is
 * the proven lowering, attribute-remapped so downstream operators
 * bind against the node's declared output.
 *
 * Semantic args are resolved `Attribute`s, not names: Catalyst
 * derives `expressions`/`references` from constructor fields by
 * reflection, which is what lets the optimizer prune unreferenced
 * right-side columns under the node while never pruning what the
 * lowering needs.
 *
 * Registration rides the PUBLIC runtime seam
 * (`spark.experimental.extraStrategies`) rather than config-time
 * `spark.sql.extensions` injection, so the operator works in an
 * already-running session — [[GraftStrategies.register]] is
 * idempotent and [[AsOf.join]] calls it for you.
 */
case class GraftAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftOrder: Attribute,
    rightOrder: Attribute,
    rightValues: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): GraftAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/**
 * Plans [[GraftAsOfJoin]]: lower to the proven composed plan
 * (union + last-ignoring-nulls window + side filter), then remap the
 * lowered output onto the node's declared attribute ids so every
 * downstream operator's bindings hold. `planLater` hands the lowered
 * logical plan back to the planner — the strategy composes with every
 * other strategy and with AQE for free.
 */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: GraftAsOfJoin =>
      val spark = SparkSession.active
      val l = GraftPlanBridge.ofRows(spark, j.left)
      val r = GraftPlanBridge.ofRows(spark, j.right)
      // optimizedPlan, not analyzed: planLater does NOT re-run the
      // optimizer on the subtree it plans, so lowering from the
      // analyzed plan would hand the union/window chain to the planner
      // with no filter pushdown, column pruning, or constant folding
      // inside it — quietly forfeiting the node's declarative rationale.
      // The optimizer preserves the plan's output schema, so the
      // name-keyed exprId remap below still binds.
      val lowered = graft.ops.Relational.asOfJoin(
          l, r,
          keys = j.leftKeys.map(_.name),
          leftOrder = j.leftOrder.name,
          rightOrder = j.rightOrder.name,
          rightValues = j.rightValues.map(_.name))
        .queryExecution.optimizedPlan
      val remapped = Project(j.output.map { a =>
        val srcs = lowered.output.filter(_.name == a.name)
        if (srcs.size != 1)
          throw new IllegalStateException(
            s"as-of lowering must expose column ${a.name} exactly once, " +
              s"found ${srcs.size}: ${lowered.output}")
        Alias(srcs.head, a.name)(exprId = a.exprId)
      }, lowered)
      planLater(remapped) :: Nil
    case _ => Nil
  }
}

object GraftStrategies {
  /** Idempotently add the engine's strategies to a running session. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }
}

/** Public API over the custom node. */
object AsOf {
  /**
   * As-of join `left` to `right` on equal `keys`, matching each left
   * row to the right row with the greatest `rightOrder` ≤ its
   * `leftOrder` (inclusive), surfacing `rightValues` (NULL when no
   * right row precedes). Key/value/order column NAMES must be
   * unambiguous across the two sides — the same contract as
   * [[graft.ops.Relational.asOfJoin]], which this operator plans to.
   */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftOrder: String, rightOrder: String,
           rightValues: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    GraftStrategies.register(spark)
    // UNIQUE resolution, enforcing the "unambiguous names" contract the
    // docs state: find(_.name == ...) on a side carrying duplicate
    // column names would silently bind the first match.
    def unique[A](matches: Seq[A], name: String, columns: Seq[String]): A = {
      if (matches.isEmpty)
        throw new IllegalArgumentException(
          s"column $name not found in ${columns.mkString(", ")}")
      if (matches.size > 1)
        throw new IllegalArgumentException(
          s"column $name is ambiguous (${matches.size} matches) — as-of " +
            "join requires unambiguous column names on each side")
      matches.head
    }
    def attr(df: DataFrame, name: String): Attribute =
      unique(df.queryExecution.analyzed.output.filter(_.name == name),
        name, df.columns.toSeq)
    // SELF-JOIN SAFETY (r21): when both sides derive from the same base
    // relation (q50 joins purchases to clicks of ONE events table), the
    // children's outputs share exprIds wherever a column passes through
    // un-aliased — the node's right-side attribute fields then bind
    // ambiguously, and a RE-analysis of the already-analyzed tree (any
    // .count()/.groupBy() wraps one) resolves them against the wrong
    // side and fails with UNRESOLVED_COLUMN. Re-alias every right
    // column behind a Project of fresh Aliases so the right child's
    // output ids are disjoint from the left's by construction — the
    // same discipline Spark's own self-join handling applies.
    val analyzedRight = right.queryExecution.analyzed
    val freshAliases = analyzedRight.output.map(a => Alias(a, a.name)())
    val freshRight = Project(freshAliases, analyzedRight)
    def rattr(name: String): Attribute =
      unique(freshAliases.filter(_.name == name), name, right.columns.toSeq)
        .toAttribute
    val leftOut = left.queryExecution.analyzed.output.map(_.name).toSet
    rightValues.foreach(v => require(!leftOut.contains(v),
      s"right value column $v collides with a left column"))
    GraftPlanBridge.ofRows(spark, GraftAsOfJoin(
      left.queryExecution.analyzed, freshRight,
      keys.map(attr(left, _)), keys.map(rattr),
      attr(left, leftOrder), rattr(rightOrder),
      rightValues.map(rattr)))
  }
}

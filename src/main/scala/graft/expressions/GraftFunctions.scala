package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import HashExpressions._

/**
 * SQL registration for the engine's native expressions, so
 * `spark.sql("SELECT simhash64(split(text, ' ')) …")` works alongside
 * the Column API. Two entry points:
 *
 *  - [[GraftExtensions]] for config-time injection:
 *    `--conf spark.sql.extensions=graft.expressions.GraftExtensions`
 *  - [[GraftFunctions.register]] for an already-running session.
 */
object GraftFunctions {

  private def constInt(e: Expression, fn: String): Int = e match {
    case lit: Literal => lit.value.asInstanceOf[Number].intValue()
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got: $other")
  }

  private def constBool(e: Expression, fn: String): Boolean = e match {
    case lit: Literal => lit.value.asInstanceOf[Boolean]
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal boolean argument, got: $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[HashExpressions.type].getName, name)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(arr, k)"),
      (args: Seq[Expression]) =>
        MinHashSignature(args.head, constInt(args(1), "minhash_signature"))),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens)"),
      (args: Seq[Expression]) => SimHash(args.head)),
    (FunctionIdentifier("token_shingles"),
      info("token_shingles", "token_shingles(tokens, w, distinct)"),
      (args: Seq[Expression]) => TokenShingles(args.head,
        constInt(args(1), "token_shingles"), constBool(args(2), "token_shingles"))),
    (FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b)"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))))

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}

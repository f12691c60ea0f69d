package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the engine's native Catalyst
  * expressions available from SQL text, so `spark.sql("SELECT cosine_sim(
  * a, b) ...")` plans the same codegen'd expression the DataFrame surface
  * uses — one implementation, two front doors.
  *
  * Activation paths:
  *  - spark-submit / cluster: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *  - existing session (tests, notebooks): `GraftExtensions.register(spark)`
  *    (same registration, applied to the live FunctionRegistry).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[CosineSim].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  /** (name, info, builder) for every injected function. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      "cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two array<double> (null on zero norm)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"cosine_sim expects 2 arguments, got ${args.length}")
        CosineSim(args.head, args(1))
      }))

  /** Register on an already-built session (extensions normally apply only
    * at session construction). */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, i, builder) =>
      registry.registerFunction(FunctionIdentifier(name), i, builder)
    }
  }
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use. Activate cluster-wide with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (no code changes on
  * the driver), or call [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.pipNative)
}

object GraftExtensions {
  private def builder(children: Seq[Expression]): Expression = {
    require(children.length == 3, "pip_native(lon, lat, geom) takes 3 arguments")
    new PointInMultiPolygon(children(0), children(1), children(2))
  }

  val pipNative: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("pip_native"),
      new ExpressionInfo(classOf[PointInMultiPolygon].getName, "pip_native"),
      builder _)

  /** Late registration on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      pipNative._1, pipNative._2, pipNative._3)
}

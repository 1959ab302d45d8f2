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
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type Reg = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def pipBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 3, "pip_native(lon, lat, geom) takes 3 arguments")
    new PointInMultiPolygon(children(0), children(1), children(2))
  }

  private def binary(name: String, mk: (Expression, Expression) => Expression)
      (children: Seq[Expression]): Expression = {
    require(children.length == 2, s"$name takes 2 arguments")
    mk(children(0), children(1))
  }

  val pipNative: Reg =
    (FunctionIdentifier("pip_native"),
      new ExpressionInfo(classOf[PointInMultiPolygon].getName, "pip_native"),
      pipBuilder _)

  val shingleHashes: Reg =
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "shingle_hashes"),
      binary("shingle_hashes(words, n)", new ShingleHashesExpr(_, _)) _)

  val minhashSignature: Reg =
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "minhash_signature"),
      binary("minhash_signature(hashes, numHashes)", new MinHashSignatureExpr(_, _)) _)

  val simhash64: Reg =
    (FunctionIdentifier("simhash64_native"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64_native"),
      { children: Seq[Expression] =>
        require(children.length == 1, "simhash64_native(tokens) takes 1 argument")
        new SimHash64Expr(children.head)
      })

  val signBucket: Reg =
    (FunctionIdentifier("sign_bucket"),
      new ExpressionInfo(classOf[SignBucketExpr].getName, "sign_bucket"),
      { children: Seq[Expression] =>
        require(children.length == 3, "sign_bucket(vec, nPlanes, planeOffset) takes 3 arguments")
        new SignBucketExpr(children(0), children(1), children(2))
      })

  val distPoly: Reg =
    (FunctionIdentifier("dist_poly_native"),
      new ExpressionInfo(classOf[DistanceToMultiPolygon].getName, "dist_poly_native"),
      { children: Seq[Expression] =>
        require(children.length == 3, "dist_poly_native(lon, lat, geom) takes 3 arguments")
        new DistanceToMultiPolygon(children(0), children(1), children(2))
      })

  val haversine: Reg =
    (FunctionIdentifier("haversine_native"),
      new ExpressionInfo(classOf[HaversineMeters].getName, "haversine_native"),
      { children: Seq[Expression] =>
        require(children.length == 4, "haversine_native(lon1, lat1, lon2, lat2) takes 4 arguments")
        new HaversineMeters(children(0), children(1), children(2), children(3))
      })

  val all: Seq[Reg] =
    Seq(pipNative, shingleHashes, minhashSignature, simhash64, signBucket, distPoly, haversine)

  /** Late registration on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (id, info, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, b)
    }
}

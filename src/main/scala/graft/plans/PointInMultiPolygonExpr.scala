package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType}

/** Ray-cast point-in-multipolygon over Spark's internal `ArrayData` — no
  * Catalyst→Scala collection conversion. Called from both the interpreted
  * and the generated code paths of [[PointInMultiPolygon]].
  *
  * Semantics identical to graft.geo.Geo.pointInMultiPolygon
  * (exterior ring minus holes, edge cases implementation-defined), which
  * stays the property-tested reference implementation.
  */
object PipKernel {

  def ringContains(lon: Double, lat: Double, ring: ArrayData): Boolean = {
    var inside = false
    val n = ring.numElements()
    var i = 0
    var j = n - 1
    while (i < n) {
      val pi = ring.getArray(i)
      val pj = ring.getArray(j)
      val xi = pi.getDouble(0); val yi = pi.getDouble(1)
      val xj = pj.getDouble(0); val yj = pj.getDouble(1)
      if (((yi > lat) != (yj > lat)) &&
        (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  def polygonContains(lon: Double, lat: Double, poly: ArrayData): Boolean = {
    val nRings = poly.numElements()
    if (nRings == 0 || !ringContains(lon, lat, poly.getArray(0))) return false
    var h = 1
    while (h < nRings) { // a hit inside any hole is a miss
      if (ringContains(lon, lat, poly.getArray(h))) return false
      h += 1
    }
    true
  }

  def contains(lon: Double, lat: Double, mp: ArrayData): Boolean = {
    val nPolys = mp.numElements()
    var p = 0
    while (p < nPolys) {
      if (polygonContains(lon, lat, mp.getArray(p))) return true
      p += 1
    }
    false
  }
}

/** Native Catalyst expression for the hot spatial predicate (SURVEY §2.9):
  * `ST_Intersects(point, multipolygon)`. Compared to the ScalaUDF binding,
  * this stays inside whole-stage codegen (defineCodeGen emits a static
  * call) and never materializes the nested Seq[Seq[Seq[Seq[Double]]]]
  * geometry per (point × polygon) probe — the dominant cost of the UDF at
  * enrichment scale.
  */
case class PointInMultiPolygon(first: Expression, second: Expression,
                               third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isGeom(t: DataType): Boolean = t match {
      case ArrayType(ArrayType(ArrayType(ArrayType(DoubleType, _), _), _), _) => true
      case _ => false
    }
    if (first.dataType == DoubleType && second.dataType == DoubleType &&
      isGeom(third.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pip expects (double, double, array⁴<double>), got " +
          s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  override protected def nullSafeEval(lon: Any, lat: Any, geom: Any): Any =
    PipKernel.contains(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      geom.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat, g) =>
      s"graft.plans.PipKernel.contains($lon, $lat, $g)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PointInMultiPolygon {
  /** Column binding: `pipNative(lon, lat, geom)`. */
  def apply(lon: Column, lat: Column, geom: Column): Column =
    ColumnBridge.column(new PointInMultiPolygon(
      ColumnBridge.expression(lon.cast("double")),
      ColumnBridge.expression(lat.cast("double")),
      ColumnBridge.expression(geom)))
}

/** Native haversine distance (meters) — the KNN candidate scorer runs once
  * per (fact × candidate) pair, so it gets the same codegen treatment as
  * the PIP predicate. Delegates to graft.geo.Geo.haversineMeters (the
  * property-tested kernel) from both eval paths.
  */
case class HaversineMeters(first: Expression, second: Expression,
                           third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"haversine_m expects 4 doubles, got ${children.map(_.dataType)}")

  override protected def nullSafeEval(lon1: Any, lat1: Any, lon2: Any, lat2: Any): Any =
    graft.geo.Geo.haversineMeters(lon1.asInstanceOf[Double], lat1.asInstanceOf[Double],
      lon2.asInstanceOf[Double], lat2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.geo.Geo.haversineMeters($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(newFirst, newSecond, newThird, newFourth)
}

object HaversineMeters {
  def apply(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    ColumnBridge.column(new HaversineMeters(
      ColumnBridge.expression(lon1.cast("double")),
      ColumnBridge.expression(lat1.cast("double")),
      ColumnBridge.expression(lon2.cast("double")),
      ColumnBridge.expression(lat2.cast("double"))))
}

/** Distance point→polygon boundary in meters over internal ArrayData —
  * mirrors graft.geo.Geo.distanceToMultiPolygonMeters exactly (0 inside;
  * else min over segment distances in the local equirectangular frame,
  * haversine to the projection). The KNN fallback scores every
  * (fact × candidate-dim) pair with this, so it gets the same native
  * treatment as the PIP predicate.
  */
object DistKernel {

  private def segDistanceMeters(lon: Double, lat: Double,
                                lon1: Double, lat1: Double,
                                lon2: Double, lat2: Double): Double =
    graft.geo.Geo.distancePointToSegmentMeters(lon, lat, lon1, lat1, lon2, lat2)

  def distanceMeters(lon: Double, lat: Double, mp: ArrayData): Double = {
    if (PipKernel.contains(lon, lat, mp)) return 0.0
    var best = Double.PositiveInfinity
    val nPolys = mp.numElements()
    var p = 0
    while (p < nPolys) {
      val poly = mp.getArray(p)
      val nRings = poly.numElements()
      var r = 0
      while (r < nRings) {
        val ring = poly.getArray(r)
        val n = ring.numElements()
        var i = 0
        while (i < n - 1) {
          val a = ring.getArray(i); val b = ring.getArray(i + 1)
          val d = segDistanceMeters(lon, lat,
            a.getDouble(0), a.getDouble(1), b.getDouble(0), b.getDouble(1))
          if (d < best) best = d
          i += 1
        }
        // close the ring if the data left it open
        if (n > 1) {
          val last = ring.getArray(n - 1); val head = ring.getArray(0)
          if (last.getDouble(0) != head.getDouble(0) ||
              last.getDouble(1) != head.getDouble(1)) {
            val d = segDistanceMeters(lon, lat,
              last.getDouble(0), last.getDouble(1),
              head.getDouble(0), head.getDouble(1))
            if (d < best) best = d
          }
        }
        r += 1
      }
      p += 1
    }
    best
  }
}

/** Native binding for the KNN candidate scorer. */
case class DistanceToMultiPolygon(first: Expression, second: Expression,
                                  third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isGeom(t: DataType): Boolean = t match {
      case ArrayType(ArrayType(ArrayType(ArrayType(DoubleType, _), _), _), _) => true
      case _ => false
    }
    if (first.dataType == DoubleType && second.dataType == DoubleType &&
      isGeom(third.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dist_poly expects (double, double, array⁴<double>), got " +
          s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  override protected def nullSafeEval(lon: Any, lat: Any, geom: Any): Any =
    DistKernel.distanceMeters(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      geom.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat, g) =>
      s"graft.plans.DistKernel.distanceMeters($lon, $lat, $g)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object DistanceToMultiPolygon {
  def apply(lon: Column, lat: Column, geom: Column): Column =
    ColumnBridge.column(new DistanceToMultiPolygon(
      ColumnBridge.expression(lon.cast("double")),
      ColumnBridge.expression(lat.cast("double")),
      ColumnBridge.expression(geom)))
}

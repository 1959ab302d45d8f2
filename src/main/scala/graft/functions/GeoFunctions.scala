package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf
import graft.geo.Geo

/** Spark bindings for the geometry kernel (graft.geo.Geo).
  *
  * Geometry columns are GeoJSON-style nested arrays
  * `array<array<array<array<double>>>>` (multipolygon → polygon → ring →
  * [lon,lat]), matching how the reference serves polygon coordinates
  * (sqlm/marts/prereq/030_mv_uf_polycoords_polygon_superset.sql:3-5).
  *
  * Each UDF is deliberately kept null-tolerant: a null geometry yields null,
  * which mirrors SQL semantics of the reference's left spatial joins.
  *
  * Scale note: all of these are driven through *broadcast* joins against
  * dimension tables of ≤ thousands of polygons (SURVEY §2.3 — every spatial
  * dim is small). The expensive exact predicate is always preceded by cheap
  * bbox column conjuncts that Catalyst evaluates before the UDF, so at 100 TB
  * the UDF runs on the few candidate (point, polygon) pairs only.
  */
object GeoFunctions {
  type MP = Seq[Seq[Seq[Seq[Double]]]]

  private def toMP(raw: MP): Geo.MultiPolygon =
    raw.iterator.map { poly =>
      poly.iterator.map { ring =>
        ring.iterator.map(p => (p(0), p(1))).toIndexedSeq
      }.toIndexedSeq
    }.toIndexedSeq

  val pointInMultiPolygonUdf =
    udf((lon: Double, lat: Double, mp: MP) =>
      if (mp == null) null.asInstanceOf[java.lang.Boolean]
      else java.lang.Boolean.valueOf(Geo.pointInMultiPolygon(lon, lat, toMP(mp))))

  /** Native-Expression binding for the hot PIP predicate — stays inside
    * whole-stage codegen and skips the per-probe nested-Seq conversion the
    * ScalaUDF pays (graft.plans.PointInMultiPolygon). Prefer this in join
    * conditions; the UDF remains for SQL registration parity. */
  def pointInMultiPolygon(lon: Column, lat: Column, geom: Column): Column =
    graft.plans.PointInMultiPolygon(lon, lat, geom)

  /** Native-Expression haversine — codegen'd, for per-pair scoring loops. */
  def haversineMeters(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    graft.plans.HaversineMeters(lon1, lat1, lon2, lat2)

  /** Native-Expression point→polygon distance (graft.plans.DistKernel) —
    * the KNN candidate scorer; the UDF remains the parity reference. */
  def distanceToMultiPolygonMeters(lon: Column, lat: Column, geom: Column): Column =
    graft.plans.DistanceToMultiPolygon(lon, lat, geom)

  val haversineMetersUdf =
    udf((lon1: Double, lat1: Double, lon2: Double, lat2: Double) =>
      Geo.haversineMeters(lon1, lat1, lon2, lat2))

  val distanceToMultiPolygonMetersUdf =
    udf((lon: Double, lat: Double, mp: MP) =>
      if (mp == null) null.asInstanceOf[java.lang.Double]
      else java.lang.Double.valueOf(Geo.distanceToMultiPolygonMeters(lon, lat, toMP(mp))))

  val ringAreaSqMetersUdf =
    udf((ring: Seq[Seq[Double]]) =>
      if (ring == null) null.asInstanceOf[java.lang.Double]
      else java.lang.Double.valueOf(
        Geo.ringAreaSqMeters(ring.iterator.map(p => (p(0), p(1))).toIndexedSeq)))

  val multiPolygonAreaSqMetersUdf =
    udf((mp: MP) =>
      if (mp == null) null.asInstanceOf[java.lang.Double]
      else java.lang.Double.valueOf(toMP(mp).map(Geo.polygonAreaSqMeters).sum))

  /** bbox as struct(minLon, minLat, maxLon, maxLat) — ST_Extent/ST_Envelope
    * analog (api/app/main.py:883-922). */
  val bboxUdf =
    udf((mp: MP) =>
      if (mp == null) null
      else {
        val b = Geo.bboxOfMultiPolygon(toMP(mp))
        (b.minLon, b.minLat, b.maxLon, b.maxLat)
      })

  val simplifyDPUdf =
    udf((mp: MP, tol: Double) =>
      if (mp == null) null
      else toMP(mp).map(_.map(r => Geo.simplifyDPChecked(r, tol).map(p => Seq(p._1, p._2)))))

  /** Dissolve-safety guard: true when any two parts' bbox interiors overlap
    * (the concat stand-in would double-count their area). */
  val partsBBoxOverlapUdf =
    udf((mp: MP) =>
      if (mp == null) null.asInstanceOf[java.lang.Boolean]
      else java.lang.Boolean.valueOf(Geo.partsBBoxOverlap(toMP(mp))))

  /** Exact n-ary polygon union (ST_UnaryUnion analog) — see
    * [[graft.geo.PolyUnion]]. */
  val polygonUnionUdf =
    udf((mp: MP) =>
      if (mp == null) null
      else graft.geo.PolyUnion.union(toMP(mp))
        .map(_.map(_.map(p => Seq(p._1, p._2)))))

  /** ST_MakeValid analog — arrangement rebuild of a possibly invalid
    * (multi)polygon (even-odd / linework semantics); see
    * [[graft.geo.PolyUnion.makeValid]]. */
  val makeValidUdf =
    udf((mp: MP) =>
      if (mp == null) null
      else graft.geo.PolyUnion.makeValid(toMP(mp))
        .map(_.map(_.map(p => Seq(p._1, p._2)))))

  /** Planar shoelace area in degree² (exteriors minus holes) — exact on
    * integer-coordinate fixtures, used to oracle the union output. */
  val planarAreaDeg2Udf =
    udf((mp: MP) =>
      if (mp == null) null.asInstanceOf[java.lang.Double]
      else java.lang.Double.valueOf(toMP(mp).map(poly =>
        poly.headOption.map(Geo.ringAreaPlanarDeg2).getOrElse(0.0) -
          poly.drop(1).map(Geo.ringAreaPlanarDeg2).sum).sum))

  /** Drop interior rings — ST_MakePolygon(ST_ExteriorRing(..)) analog. */
  val dropHolesUdf =
    udf((mp: MP) => if (mp == null) null else mp.map(_.take(1)))

  /** Largest part by spherical area — "mainland" selection (W4). */
  val largestPartUdf =
    udf((mp: MP) =>
      if (mp == null || mp.isEmpty) null
      else mp.maxBy(p => toMP(Seq(p)).headOption.map(Geo.polygonAreaSqMeters).getOrElse(0.0)))

  val nPointsUdf =
    udf((mp: MP) =>
      if (mp == null) null.asInstanceOf[java.lang.Integer]
      else java.lang.Integer.valueOf(toMP(mp).iterator.map(_.iterator.map(_.length).sum).sum))

  /** ST_IsValid proxy (ring closure + ≥4 points) — QA metric surface
    * (api/app/main.py:716-753). */
  val isValidUdf =
    udf((mp: MP) =>
      if (mp == null) null.asInstanceOf[java.lang.Boolean]
      else java.lang.Boolean.valueOf(Geo.isValid(toMP(mp))))

  def register(spark: SparkSession): Unit = {
    spark.udf.register("pip", pointInMultiPolygonUdf)
    spark.udf.register("haversine_m", haversineMetersUdf)
    spark.udf.register("dist_poly_m", distanceToMultiPolygonMetersUdf)
    spark.udf.register("ring_area_m2", ringAreaSqMetersUdf)
    spark.udf.register("mp_area_m2", multiPolygonAreaSqMetersUdf)
    spark.udf.register("geo_bbox", bboxUdf)
    spark.udf.register("geo_simplify", simplifyDPUdf)
    spark.udf.register("geo_drop_holes", dropHolesUdf)
    spark.udf.register("geo_largest_part", largestPartUdf)
    spark.udf.register("geo_npoints", nPointsUdf)
    spark.udf.register("geo_is_valid", isValidUdf)
    spark.udf.register("geo_parts_overlap", partsBBoxOverlapUdf)
    spark.udf.register("geo_union", polygonUnionUdf)
    spark.udf.register("geo_make_valid", makeValidUdf)
  }
}

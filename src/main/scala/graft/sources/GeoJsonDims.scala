package graft.sources

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GeoFunctions

/** S5 — polygon dimension source from GeoJSON FeatureCollections (the
  * reference converts IBGE shapefiles with ogr2ogr and loads the result,
  * src/etl/ensure_ref_ibge.py:185-254; our engine-side contract is the
  * pre-converted GeoJSON/Parquet fixture, SURVEY §2.1 S5).
  *
  * Dimension files are small (≤ tens of MB for all 5 570 municipalities),
  * so the FeatureCollection is parsed driver-side (Jackson, shipped with
  * Spark) and handed to Spark as a DataFrame with:
  *   - every feature property as a string column (nulls preserved),
  *   - `geom` as the engine's nested-array multipolygon (Polygon features
  *     are promoted to single-part MultiPolygon),
  *   - bbox columns (min_lon/min_lat/max_lon/max_lat) ready for the
  *     broadcast-join prefilters.
  */
object GeoJsonDims {

  private def ringToSeq(ring: JsonNode): Seq[Seq[Double]] = {
    val out = mutable.ArrayBuffer[Seq[Double]]()
    ring.forEach(pt => out += Seq(pt.get(0).asDouble, pt.get(1).asDouble))
    out.toSeq
  }

  private def polygonToSeq(poly: JsonNode): Seq[Seq[Seq[Double]]] = {
    val out = mutable.ArrayBuffer[Seq[Seq[Double]]]()
    poly.forEach(ring => out += ringToSeq(ring))
    out.toSeq
  }

  /** geometry node → multipolygon nested arrays (null for non-polygonal). */
  def geometryToMultiPolygon(geom: JsonNode): Seq[Seq[Seq[Seq[Double]]]] = {
    if (geom == null || geom.isNull) return null
    geom.get("type").asText() match {
      case "Polygon" => Seq(polygonToSeq(geom.get("coordinates")))
      case "MultiPolygon" =>
        val out = mutable.ArrayBuffer[Seq[Seq[Seq[Double]]]]()
        geom.get("coordinates").forEach(poly => out += polygonToSeq(poly))
        out.toSeq
      case _ => null // points/lines are not dimension geometries
    }
  }

  def readFeatureCollection(spark: SparkSession, path: String): DataFrame = {
    val mapper = new ObjectMapper()
    val rootNode = mapper.readTree(new java.io.File(path))
    require(rootNode.get("type") != null &&
      rootNode.get("type").asText() == "FeatureCollection",
      s"$path is not a GeoJSON FeatureCollection")

    // property-key union across features → stable, sorted string columns
    val propKeys = mutable.SortedSet[String]()
    rootNode.get("features").forEach { f =>
      val props = f.get("properties")
      if (props != null && !props.isNull)
        props.fieldNames().forEachRemaining(k => propKeys += k)
    }
    val keys = propKeys.toSeq

    val rows = mutable.ArrayBuffer[Row]()
    rootNode.get("features").forEach { f =>
      val props = f.get("properties")
      val vals = keys.map { k =>
        val v = if (props == null) null else props.get(k)
        if (v == null || v.isNull) null else v.asText()
      }
      rows += Row.fromSeq(vals :+ geometryToMultiPolygon(f.get("geometry")))
    }

    val geomType = ArrayType(ArrayType(ArrayType(ArrayType(DoubleType))))
    val schema = StructType(
      keys.map(k => StructField(k, StringType)) :+ StructField("geom", geomType))
    // 1 partition ON PURPOSE: a FeatureCollection dim file is ≤5 570 rows
    // (the reference's municipality layer) and is parsed driver-side anyway;
    // downstream joins broadcast it, so splitting buys nothing
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    df.withColumn("bb", GeoFunctions.bboxUdf(col("geom")))
      .withColumn("min_lon", col("bb._1")).withColumn("min_lat", col("bb._2"))
      .withColumn("max_lon", col("bb._3")).withColumn("max_lat", col("bb._4"))
      .drop("bb")
  }
}

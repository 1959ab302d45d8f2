package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DimNormalizer, GeoJsonDims}

/** S5 — GeoJSON FeatureCollection dim source: Polygon/MultiPolygon parsing,
  * property-column union, bbox derivation, and composition with the S6
  * normalizer into an enrichment-ready dimension. */
class GeoJsonDimsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeFixture(): String = {
    val f = Files.createTempDirectory("graft_geojson").resolve("dims.geojson")
    Files.writeString(f,
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"cd_mun":"1100015","nm_mun":"Alpha","uf":"RO"},
        | "geometry":{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}},
        |{"type":"Feature","properties":{"cd_mun":"1100023","nm_mun":"Beta","uf":"AC","extra":"x"},
        | "geometry":{"type":"MultiPolygon","coordinates":[
        |   [[[20,0],[30,0],[30,10],[20,10],[20,0]]],
        |   [[[40,0],[45,0],[45,5],[40,5],[40,0]]]]}},
        |{"type":"Feature","properties":{"cd_mun":"9999999","nm_mun":"NoGeom","uf":"ZZ"},
        | "geometry":null}
        |]}""".stripMargin)
    f.toString
  }

  test("FeatureCollection -> properties + multipolygon + bbox columns") {
    val df = GeoJsonDims.readFeatureCollection(spark, writeFixture())
    assert(df.count() == 3)
    assert(df.columns.toSet ==
      Set("cd_mun", "nm_mun", "uf", "extra", "geom",
        "min_lon", "min_lat", "max_lon", "max_lat"))

    val alpha = df.filter(col("cd_mun") === "1100015").head
    assert(alpha.getAs[String]("extra") == null) // missing property -> null
    assert(alpha.getAs[Double]("max_lon") == 10.0)

    val beta = df.filter(col("cd_mun") === "1100023").head
    assert(beta.getSeq[Any](beta.fieldIndex("geom")).size == 2) // two parts
    assert(beta.getAs[Double]("min_lon") == 20.0)
    assert(beta.getAs[Double]("max_lon") == 45.0) // bbox unions both parts

    assert(df.filter(col("cd_mun") === "9999999").head.isNullAt(
      df.columns.indexOf("geom")))

    // the parsed geometry drives the PIP predicate directly
    val hits = df.filter(col("geom").isNotNull)
      .filter(graft.functions.GeoFunctions.pointInMultiPolygon(
        lit(42.0), lit(2.0), col("geom")))
    assert(hits.select("cd_mun").head.getString(0) == "1100023")
  }

  test("S5 + S6 compose: GeoJSON source through the dimension normalizer") {
    val dims = GeoJsonDims.readFeatureCollection(spark, writeFixture())
      .filter(col("geom").isNotNull)
    val normalized = DimNormalizer.normalize(dims,
      codeCandidates = Seq("cd_mun"), nameCandidates = Seq("nm_mun"))
    assert(normalized.columns.toSet ==
      Set("dim_id", "code", "name", "geom", "min_lon", "min_lat", "max_lon", "max_lat"))
    assert(normalized.orderBy("dim_id").collect().map(_.getAs[String]("code")).toSeq ==
      Seq("1100015", "1100023"))
  }
}

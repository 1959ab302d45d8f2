package graft

import org.scalatest.funsuite.AnyFunSuite

/** Loud-codegen run of the geometry query family.
  *
  * Round-6 finding: `geo_area` built a 4-deep multipolygon array and
  * immediately `element_at(element_at(...))`-destructured it; the generated
  * Java tripped Janino ("project_isNull_N is not an rvalue") and Spark
  * SILENTLY fell back to interpreted projection — output stayed correct,
  * but the "codegen'd" claim was false and at scale the interpreted path is
  * the slow one. `spark.sql.codegen.fallback=false` turns that silent
  * fallback into a hard failure, so any future Janino rejection in these
  * plans fails CI here instead of hiding behind an ERROR log line.
  */
class GeoCodegenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val geoQueries = Seq(
    "geo_area", "geo_bbox", "geo_dump_parts", "geo_mainland", "geo_union",
    "geo_dissolve", "geo_makevalid", "serve_geo_qa", "serve_bounds")

  test("geometry family compiles under codegen.fallback=false (no silent " +
    "interpreted projection)") {
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      for (q <- geoQueries) {
        val df = SparkEntry.queries(q)(spark, sf)
        // execute the query's OWN physical plan: df.count() rewrites to
        // Aggregate(count(1)) and column-prunes the deterministic geometry
        // projections — the very expressions this guard must compile
        val n = df.queryExecution.toRdd.count()
        assert(n > 0, s"$q returned no rows")
      }
    } finally {
      prevFallback match {
        case Some(v) => conf.set("spark.sql.codegen.fallback", v)
        case None    => conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}

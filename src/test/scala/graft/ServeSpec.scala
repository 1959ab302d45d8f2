package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.serve.Serve

/** Serve-layer behaviors not covered by the oracle queries: the points
  * limit+1 truncation probe (single job), filter normalization, range
  * validation, and timeseries auto-bucketing thresholds. */
class ServeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("points: one-job limit+1 probe reports truncation and keeps order") {
    import spark.implicits._
    val facts = (1 to 5).map(i =>
        (java.sql.Date.valueOf(f"2024-01-0$i"), s"h$i", -50.0 + i, -10.0 + i))
      .toDF("file_date", "event_hash", "lon", "lat")
    val (rows, truncated) = Serve.points(facts,
      LocalDate.parse("2024-01-01"), LocalDate.parse("2024-02-01"), None, limit = 3)
    assert(truncated)
    assert(rows.map(_.getAs[String]("event_hash")) == Seq("h1", "h2", "h3"))
    val (all, notTrunc) = Serve.points(facts,
      LocalDate.parse("2024-01-01"), LocalDate.parse("2024-02-01"), None, limit = 10)
    assert(!notTrunc && all.size == 5)
    // bbox filter composes
    val (boxed, _) = Serve.points(facts,
      LocalDate.parse("2024-01-01"), LocalDate.parse("2024-02-01"),
      Some((-48.5, -8.5, -46.5, -6.5)), limit = 10)
    assert(boxed.map(_.getAs[String]("event_hash")) == Seq("h2", "h3"))
  }

  test("filter normalization: trim + uppercase, empty -> None (main.py:136-158)") {
    val f = Serve.normalizeFilters(Serve.Filters(
      uf = Some("  mt "), bioma = Some(""), mun = Some(" x"), uc = None, ti = Some("   ")))
    assert(f == Serve.Filters(uf = Some("MT"), bioma = None, mun = Some("X"), uc = None, ti = None))
  }

  test("range validation: from < to, span <= 365 days") {
    intercept[IllegalArgumentException] {
      Serve.validateRange(LocalDate.parse("2024-01-02"), LocalDate.parse("2024-01-02"))
    }
    intercept[IllegalArgumentException] {
      Serve.validateRange(LocalDate.parse("2023-01-01"), LocalDate.parse("2024-06-01"))
    }
    Serve.validateRange(LocalDate.parse("2024-01-01"), LocalDate.parse("2024-12-31"))
  }

  test("geometryGeoJson renders canonical sorted-key compact GeoJSON; coordsHash is its sha1 prefix") {
    val mp: graft.geo.Geo.MultiPolygon = IndexedSeq(IndexedSeq(IndexedSeq(
      (0.0, 0.0), (10.0, 0.0), (10.5, 10.0), (0.0, 0.0))))
    val json = Serve.geometryGeoJson(mp)
    assert(json ==
      """{"coordinates":[[[[0.0,0.0],[10.0,0.0],[10.5,10.0],[0.0,0.0]]]],"type":"MultiPolygon"}""")
    assert(Serve.coordsHash(mp).length == 16)
    assert(Serve.coordsHash(mp) == Serve.coordsHash(mp)) // deterministic
  }

  test("geoShapeMetrics: overlapping parts union before area metrics; bounds empty on miss") {
    import spark.implicits._
    def rectMp(x1: Double, y1: Double, x2: Double, y2: Double) =
      Seq(Seq(Seq(Seq(x1, y1), Seq(x2, y1), Seq(x2, y2), Seq(x1, y2), Seq(x1, y1))))
    val geoms = Seq(
      ("K", "N", rectMp(0.0, 0.0, 1.0, 1.0)),
      ("K", "N", rectMp(0.5, 0.5, 1.5, 1.5))).toDF("key", "uf", "geom")
    val m = Serve.geoShapeMetrics(geoms, "K", simplify = false).get
    assert(m.nPartsBeforeUnion == 2)
    // union area = two 1°×1° cells minus the 0.5°×0.5° overlap: the concat
    // stand-in would report the full 2-cell sum (double-counting ~14%)
    val cell = graft.geo.Geo.ringAreaSqMeters(
      IndexedSeq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)))
    assert(m.areaM2UnionBefore < 1.80 * cell,
      s"union area ${m.areaM2UnionBefore} should drop the double-counted overlap (cell=$cell)")
    assert(m.areaM2UnionBefore > 1.70 * cell)
    // empty ⇔ 404 contract for bounds on a missing key
    assert(Serve.bounds(geoms, "NOPE").isEmpty)
  }

  test("timeseries auto-bucketing thresholds (92/273 days, main.py:392-397)") {
    assert(Serve.granularity(92) == "day")
    assert(Serve.granularity(93) == "week")
    assert(Serve.granularity(273) == "week")
    assert(Serve.granularity(274) == "month")
  }
}

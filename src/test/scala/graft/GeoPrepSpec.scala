package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.marts.GeoPrep

/** Dissolve overlap guard: the concat stand-in for ST_UnaryUnion is only
  * area-correct for disjoint parts, so overlapping inputs must be flagged
  * (or fail fast in raise mode) instead of silently double-counting area.
  */
class GeoPrepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rectMp(x1: Double, y1: Double, x2: Double, y2: Double) =
    Seq(Seq(Seq(
      Seq(x1, y1), Seq(x2, y1), Seq(x2, y2), Seq(x1, y2), Seq(x1, y1))))

  test("dissolveByKey: disjoint parts unflagged, overlapping parts flagged") {
    val geoms = Seq(
      ("A", rectMp(0, 0, 10, 10)), ("A", rectMp(10, 0, 20, 10)), // edge-touching
      ("B", rectMp(0, 0, 10, 10)), ("B", rectMp(5, 5, 15, 15))   // interior overlap
    ).toDF("key", "geom")
    val out = GeoPrep.dissolveByKey(geoms, Seq("key"))
      .select("key", "n_parts", "overlap_flag").collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(out("A") == ((2, false)))
    assert(out("B") == ((2, true)))
  }

  test("dissolveByKey union mode: overlapping key unions exactly, disjoint key concats") {
    val geoms = Seq(
      ("A", rectMp(0, 0, 10, 10)), ("A", rectMp(20, 0, 30, 10)),  // disjoint
      ("B", rectMp(0, 0, 10, 10)), ("B", rectMp(5, 5, 15, 15))    // overlap
    ).toDF("key", "geom")
    val out = GeoPrep.dissolveByKey(geoms, Seq("key"), onOverlap = "union")
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(out("A").getAs[Int]("n_parts") == 2) // concat path untouched
    // union path: one merged ring, inclusion-exclusion area 100+100-25
    type CSeq[A] = scala.collection.Seq[A]
    val bGeom = out("B").getSeq[CSeq[CSeq[CSeq[Double]]]](1)
    assert(out("B").getAs[Int]("n_parts") == 1)
    val ring = bGeom.head.head.iterator.map(p => (p(0), p(1))).toIndexedSeq
    assert(math.abs(graft.geo.Geo.ringAreaPlanarDeg2(ring) - 175.0) < 1e-6)
  }

  test("dissolveByKey raise mode: overlapping key fails the job") {
    val bad = Seq(("B", rectMp(0, 0, 10, 10)), ("B", rectMp(5, 5, 15, 15)))
      .toDF("key", "geom")
    val e = intercept[Exception] {
      GeoPrep.dissolveByKey(bad, Seq("key"), onOverlap = "raise").collect()
    }
    assert(e.getMessage.contains("overlapping parts") ||
      Option(e.getCause).exists(_.getMessage.contains("overlapping parts")))

    // the guard must survive column pruning: a caller that never reads
    // overlap_flag still fails (raise_error lives in the geom projection)
    val e2 = intercept[Exception] {
      GeoPrep.dissolveByKey(bad, Seq("key"), onOverlap = "raise")
        .select("key", "geom", "n_parts").collect()
    }
    assert(e2.getMessage.contains("overlapping parts") ||
      Option(e2.getCause).exists(_.getMessage.contains("overlapping parts")))

    val ok = Seq(("A", rectMp(0, 0, 10, 10)), ("A", rectMp(10, 0, 20, 10)))
      .toDF("key", "geom")
    assert(GeoPrep.dissolveByKey(ok, Seq("key"), onOverlap = "raise").count() == 1)
  }
}

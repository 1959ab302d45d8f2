package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Geo._

class GeoSpec extends AnyFunSuite {

  private def ring(pts: (Double, Double)*): Ring = pts.toIndexedSeq
  private def rect(x1: Double, y1: Double, x2: Double, y2: Double): Ring =
    ring((x1, y1), (x2, y1), (x2, y2), (x1, y2), (x1, y1))

  test("pointInRing: rectangle") {
    val r = rect(0, 0, 10, 5)
    assert(pointInRing(5, 2.5, r))
    assert(!pointInRing(-1, 2.5, r))
    assert(!pointInRing(5, 6, r))
    assert(!pointInRing(11, 2.5, r))
  }

  test("pointInRing: concave polygon (L-shape)") {
    // L-shape: big square minus top-right quadrant
    val l = ring((0, 0), (10, 0), (10, 5), (5, 5), (5, 10), (0, 10), (0, 0))
    assert(pointInRing(2, 8, l))
    assert(pointInRing(8, 2, l))
    assert(!pointInRing(8, 8, l)) // cut-out corner
  }

  test("pointInPolygon: hole excluded") {
    val withHole: Polygon = IndexedSeq(rect(0, 0, 10, 10), rect(4, 4, 6, 6))
    assert(pointInPolygon(2, 2, withHole))
    assert(!pointInPolygon(5, 5, withHole)) // inside the hole
  }

  test("pointInMultiPolygon: any part matches") {
    val mp: MultiPolygon = IndexedSeq(
      IndexedSeq(rect(0, 0, 1, 1)), IndexedSeq(rect(10, 10, 11, 11)))
    assert(pointInMultiPolygon(0.5, 0.5, mp))
    assert(pointInMultiPolygon(10.5, 10.5, mp))
    assert(!pointInMultiPolygon(5, 5, mp))
  }

  test("pointInRing property sweep: rectangles agree with bbox test") {
    // deterministic pseudo-random sweep (no RNG state): 1000 cases
    var k = 0
    while (k < 1000) {
      val h = graft.functions.HashFunctions.fnv1a64(s"case-$k")
      def u(shift: Int): Double = ((h >>> shift) & 0xffff).toDouble / 65535.0
      val x1 = -179.0 + u(0) * 340.0
      val y1 = -84.0 + u(16) * 160.0
      val lon = -179.0 + u(32) * 358.0
      val r = rect(x1, y1, x1 + 7.3, y1 + 4.1)
      val lat = y1 + 2.0
      if (math.abs(lon - x1) > 1e-6 && math.abs(lon - (x1 + 7.3)) > 1e-6) {
        val inside = lon > x1 && lon < x1 + 7.3
        assert(pointInRing(lon, lat, r) == inside, s"case $k lon=$lon x1=$x1")
      }
      k += 1
    }
  }

  test("haversine: known distances") {
    // equator degree ≈ 111.19 km
    val d = haversineMeters(0, 0, 1, 0)
    assert(math.abs(d - 111195) < 100)
    assert(haversineMeters(10, 20, 10, 20) == 0.0)
    // symmetric
    assert(math.abs(haversineMeters(1, 2, 3, 4) - haversineMeters(3, 4, 1, 2)) < 1e-9)
  }

  test("distanceToMultiPolygon: inside → 0, outside → segment distance") {
    val mp: MultiPolygon = IndexedSeq(IndexedSeq(rect(0, 0, 10, 10)))
    assert(distanceToMultiPolygonMeters(5, 5, mp) == 0.0)
    val d = distanceToMultiPolygonMeters(11, 5, mp) // 1° east of edge at lat 5
    val expect = haversineMeters(11, 5, 10, 5)
    assert(math.abs(d - expect) / expect < 0.01)
  }

  test("ring areas: planar and spherical") {
    assert(math.abs(ringAreaPlanarDeg2(rect(0, 0, 2, 3)) - 6.0) < 1e-12)
    // 1°×1° at equator ≈ 12 365 km²
    val a = ringAreaSqMeters(rect(0, 0, 1, 1))
    assert(math.abs(a / 1e6 - 12364) < 50)
    // polygon with hole: area subtracts
    val outer = rect(0, 0, 10, 10); val hole = rect(4, 4, 6, 6)
    val full = polygonAreaSqMeters(IndexedSeq(outer))
    val holed = polygonAreaSqMeters(IndexedSeq(outer, hole))
    assert(holed < full && holed > 0)
  }

  test("simplifyDP: collinear points removed, tolerance respected") {
    val line = ring((0, 0), (1, 0.0000001), (2, 0), (3, 0.5), (4, 0))
    val simplified = simplifyDP(line, 0.01)
    assert(simplified.length == 4) // drops (1, ~0) keeps (3, 0.5)
    assert(simplified.contains((3.0, 0.5)))
    // closed ring below min size falls back to original
    val tri = ring((0, 0), (1, 0), (0, 1), (0, 0))
    assert(simplifyDP(tri, 10.0) == tri)
  }

  test("ringSelfIntersects: bowtie flagged, simple shapes not") {
    val bowtie = ring((0, 0), (2, 2), (2, 0), (0, 2), (0, 0))
    assert(ringSelfIntersects(bowtie))
    assert(!ringSelfIntersects(rect(0, 0, 10, 5)))
    val l = ring((0, 0), (10, 0), (10, 5), (5, 5), (5, 10), (0, 10), (0, 0))
    assert(!ringSelfIntersects(l)) // concave but simple
  }

  test("simplifyDPChecked: property — simplification never introduces a crossing") {
    // deterministic pseudo-random star polygons (simple by construction:
    // vertices at increasing angles around a center) across tolerances;
    // the checked variant must never output a self-intersecting ring
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 50) {
      val n = 8 + rnd.nextInt(40)
      val pts = (0 until n).map { i =>
        val ang = 2 * math.Pi * i / n
        val rad = 1.0 + 4.0 * rnd.nextDouble()
        (rad * math.cos(ang), rad * math.sin(ang))
      }
      val r: Ring = (pts :+ pts.head).toIndexedSeq
      assert(!ringSelfIntersects(r), s"trial $trial generator produced non-simple input")
      for (tol <- Seq(0.01, 0.1, 0.5, 2.0)) {
        val out = simplifyDPChecked(r, tol)
        assert(!ringSelfIntersects(out), s"trial $trial tol $tol introduced a crossing")
        assert(out.length >= 4 && out.head == out.last, s"trial $trial tol $tol degenerate")
      }
    }
  }

  test("simplifySharedBorders: two polygons sharing a wiggly border " +
    "simplify it IDENTICALLY (no gap/overlap), junctions are pinned, and " +
    "standalone rings behave like plain DP") {
    def shoelace(r: Ring): Double = {
      val p = if (r.head == r.last) r.dropRight(1) else r
      math.abs(p.indices.map { i =>
        val (x1, y1) = p(i); val (x2, y2) = p((i + 1) % p.length)
        x1 * y2 - x2 * y1
      }.sum) / 2
    }
    // shared wiggly border from (1,0) to (1,1): amplitude 0.001 << tol
    val wig = IndexedSeq((1.0, 0.0), (1.001, 0.2), (0.999, 0.4),
      (1.001, 0.6), (0.999, 0.8), (1.0, 1.0))
    val aRing: Ring = IndexedSeq((0.0, 0.0)) ++ wig ++
      IndexedSeq((0.0, 1.0), (0.0, 0.0))
    val bRing: Ring = IndexedSeq((1.0, 0.0), (2.0, 0.0), (2.0, 1.0)) ++
      wig.reverse.dropRight(1) :+ (1.0, 0.0)
    val aa: MultiPolygon = IndexedSeq(IndexedSeq(aRing))
    val bb: MultiPolygon = IndexedSeq(IndexedSeq(bRing))
    val Seq(sa, sb) = simplifySharedBorders(Seq(aa, bb), 0.01)
    val ra = sa.head.head
    val rb = sb.head.head
    // junction vertices survive
    assert(ra.contains((1.0, 0.0)) && ra.contains((1.0, 1.0)))
    assert(rb.contains((1.0, 0.0)) && rb.contains((1.0, 1.0)))
    // the wiggles are gone on BOTH sides — border straightened identically
    assert(!ra.exists(p => p._1 != 1.0 && p._1 > 0.5 && p._1 < 1.5), ra.toString)
    assert(!rb.exists(p => p._1 != 1.0 && p._1 > 0.5 && p._1 < 1.5), rb.toString)
    // no gap/overlap: the two areas tile the 2x1 rectangle exactly
    assert(math.abs(shoelace(ra) + shoelace(rb) - 2.0) < 1e-12,
      s"a=${shoelace(ra)} b=${shoelace(rb)}")
    // per-ring DP on the same input CAN leave wiggle points on one side
    // only (the divergence this function closes) — but whatever it does,
    // the shared-border version must keep both sides bit-identical:
    val borderA = ra.filter(_._1 == 1.0).toSet
    val borderB = rb.filter(_._1 == 1.0).toSet
    assert(borderA == borderB, s"$borderA vs $borderB")
    // a standalone ring (no shared edges) simplifies like plain DP
    val solo: MultiPolygon = IndexedSeq(IndexedSeq(ring(
      (5.0, 5.0), (6.0, 5.0005), (7.0, 5.0), (7.0, 6.0), (5.0, 6.0), (5.0, 5.0))))
    val Seq(ssolo) = simplifySharedBorders(Seq(solo), 0.01)
    assert(ssolo.head.head == simplifyDP(solo.head.head, 0.01))
  }

  test("partsBBoxOverlap: interior overlap flagged, shared edges not") {
    def part(r: Ring): Polygon = IndexedSeq(r)
    // touching along an edge (the dissolve fixtures' shape) — NOT an overlap
    val touching: MultiPolygon = IndexedSeq(part(rect(0, 0, 24, 10)), part(rect(24, 0, 48, 10)))
    assert(!partsBBoxOverlap(touching))
    val overlapping: MultiPolygon = IndexedSeq(part(rect(0, 0, 10, 10)), part(rect(5, 5, 15, 15)))
    assert(partsBBoxOverlap(overlapping))
    assert(!partsBBoxOverlap(IndexedSeq(part(rect(0, 0, 1, 1))))) // single part
  }

  test("largestPart / dropHoles / nPoints / isValid") {
    val small = IndexedSeq(rect(0, 0, 1, 1))
    val big = IndexedSeq(rect(10, 10, 20, 20), rect(12, 12, 13, 13))
    val mp: MultiPolygon = IndexedSeq(small, big)
    assert(largestPart(mp).contains(big))
    assert(dropHoles(big) == IndexedSeq(big.head))
    assert(nPoints(mp) == 15)
    assert(isValid(mp))
    assert(!isValid(IndexedSeq(IndexedSeq(ring((0, 0), (1, 0), (0, 1))))))
  }

  test("bbox") {
    val mp: MultiPolygon = IndexedSeq(IndexedSeq(rect(-5, -3, 2, 7)), IndexedSeq(rect(0, 0, 9, 1)))
    val b = bboxOfMultiPolygon(mp)
    assert(b == BBox(-5, -3, 9, 7))
    assert(b.contains(0, 0) && !b.contains(10, 0))
    assert(b.expandDegrees(1.0) == BBox(-6, -4, 10, 8))
  }
}

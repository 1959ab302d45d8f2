package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{Geo, PolyUnion}
import graft.geo.Geo._

/** The union kernel's contract: the output multipolygon covers EXACTLY the
  * set of points covered by at least one input part. Verified structurally
  * on known shapes (area via inclusion–exclusion) and behaviorally with a
  * deterministic Monte-Carlo region oracle on every fixture.
  */
class PolyUnionSpec extends AnyFunSuite {

  private def ring(pts: (Double, Double)*): Ring = pts.toIndexedSeq
  private def rect(x1: Double, y1: Double, x2: Double, y2: Double): Ring =
    ring((x1, y1), (x2, y1), (x2, y2), (x1, y2), (x1, y1))
  private def part(rs: Ring*): Polygon = rs.toIndexedSeq

  private def planarArea(mp: MultiPolygon): Double =
    mp.map { poly =>
      Geo.ringAreaPlanarDeg2(poly.head) - poly.drop(1).map(Geo.ringAreaPlanarDeg2).sum
    }.sum

  /** Monte-Carlo oracle: union membership must equal any-part membership
    * for a deterministic point cloud over the bbox (points near boundaries
    * are skipped — the kernel's documented tolerance). */
  private def assertRegionEquals(in: MultiPolygon, out: MultiPolygon,
                                 seed: Int = 7, n: Int = 4000): Unit = {
    val bb = Geo.bboxOfMultiPolygon(in).expandDegrees(0.5)
    val rnd = new scala.util.Random(seed)
    var checked = 0
    var i = 0
    while (i < n) {
      val x = bb.minLon + rnd.nextDouble() * (bb.maxLon - bb.minLon)
      val y = bb.minLat + rnd.nextDouble() * (bb.maxLat - bb.minLat)
      val expect = in.exists(p => Geo.pointInPolygon(x, y, p))
      val got = out.exists(p => Geo.pointInPolygon(x, y, p))
      // skip points within tolerance of any input edge (boundary ambiguity)
      val nearEdge = in.exists(p => p.exists { r =>
        var j = 0; var near = false
        while (j < r.length - 1 && !near) {
          val (ax, ay) = r(j); val (bx, by) = r(j + 1)
          val dx = bx - ax; val dy = by - ay
          val len2 = dx * dx + dy * dy
          val t = if (len2 == 0) 0.0
            else math.max(0.0, math.min(1.0, ((x - ax) * dx + (y - ay) * dy) / len2))
          val px = ax + t * dx; val py = ay + t * dy
          near = math.hypot(x - px, y - py) < 1e-4
          j += 1
        }
        near
      })
      if (!nearEdge) {
        assert(got == expect, s"region mismatch at ($x, $y): union=$got parts=$expect")
        checked += 1
      }
      i += 1
    }
    assert(checked > n / 2, "fixture sanity: most samples usable")
  }

  test("disjoint rectangles: both parts survive, area preserved") {
    val in: MultiPolygon = IndexedSeq(part(rect(0, 0, 10, 10)), part(rect(20, 0, 30, 10)))
    val out = PolyUnion.union(in)
    assert(out.length == 2)
    assert(math.abs(planarArea(out) - 200.0) < 1e-6)
    assertRegionEquals(in, out)
  }

  test("two overlapping rectangles: one merged ring, inclusion-exclusion area") {
    val in: MultiPolygon = IndexedSeq(part(rect(0, 0, 10, 10)), part(rect(5, 5, 15, 15)))
    val out = PolyUnion.union(in)
    assert(out.length == 1)
    assert(out.head.length == 1) // no holes
    // 100 + 100 − 25
    assert(math.abs(planarArea(out) - 175.0) < 1e-6)
    assertRegionEquals(in, out)
  }

  test("contained rectangle: inner part vanishes") {
    val in: MultiPolygon = IndexedSeq(part(rect(0, 0, 20, 20)), part(rect(5, 5, 10, 10)))
    val out = PolyUnion.union(in)
    assert(out.length == 1)
    assert(math.abs(planarArea(out) - 400.0) < 1e-6)
    assertRegionEquals(in, out)
  }

  test("triple overlap (three staircase rects): exact inclusion-exclusion") {
    val in: MultiPolygon = IndexedSeq(
      part(rect(0, 0, 10, 10)), part(rect(5, 5, 15, 15)), part(rect(10, 10, 20, 20)))
    val out = PolyUnion.union(in)
    // 3·100 − 25 − 25 − 0 + 0
    assert(math.abs(planarArea(out) - 250.0) < 1e-6)
    assertRegionEquals(in, out)
  }

  test("cross shape: two elongated rects through each other") {
    val in: MultiPolygon = IndexedSeq(part(rect(-10, -2, 10, 2)), part(rect(-2, -10, 2, 10)))
    val out = PolyUnion.union(in)
    assert(out.length == 1)
    // 80 + 80 − 16
    assert(math.abs(planarArea(out) - 144.0) < 1e-6)
    assertRegionEquals(in, out)
  }

  test("ring of four rectangles enclosing a hole") {
    // a square annulus built from four overlapping side slabs — the union
    // must produce ONE exterior with ONE hole (the courtyard)
    val in: MultiPolygon = IndexedSeq(
      part(rect(0, 0, 20, 5)),    // bottom
      part(rect(0, 15, 20, 20)),  // top
      part(rect(0, 0, 5, 20)),    // left
      part(rect(15, 0, 20, 20)))  // right
    val out = PolyUnion.union(in)
    assert(out.length == 1)
    assert(out.head.length == 2, s"expected exterior + hole, got ${out.head.length} rings")
    // 400 − 10·10 courtyard
    assert(math.abs(planarArea(out) - 300.0) < 1e-6)
    assertRegionEquals(in, out)
  }

  test("part with a hole unioned with a filler covering the hole") {
    val holey: Polygon = part(rect(0, 0, 20, 20), rect(5, 5, 15, 15).reverse)
    val filler: Polygon = part(rect(4, 4, 16, 16))
    val in: MultiPolygon = IndexedSeq(holey, filler)
    val out = PolyUnion.union(in)
    assert(out.length == 1)
    assert(out.head.length == 1, "hole must be filled")
    assert(math.abs(planarArea(out) - 400.0) < 1e-6)
    assertRegionEquals(in, out)
  }

  test("hole partially filled: the hole shrinks instead of vanishing") {
    val holey: Polygon = part(rect(0, 0, 20, 20), rect(5, 5, 15, 15).reverse)
    val filler: Polygon = part(rect(5, 5, 10, 15)) // covers the hole's left half
    val in: MultiPolygon = IndexedSeq(holey, filler)
    val out = PolyUnion.union(in)
    assert(out.length == 1)
    assert(out.head.length == 2, s"expected exterior + shrunken hole, got ${out.head.length} rings")
    // 400 − hole 100 + fill 50
    assert(math.abs(planarArea(out) - 350.0) < 1e-6)
    assertRegionEquals(in, out)
  }

  test("identical stacked parts dedup to one") {
    val in: MultiPolygon = IndexedSeq(part(rect(0, 0, 10, 10)), part(rect(0, 0, 10, 10)))
    val out = PolyUnion.union(in)
    assert(out.length == 1)
    assert(math.abs(planarArea(out) - 100.0) < 1e-6)
    assertRegionEquals(in, out)
  }

  test("mixed degeneracy: overlap + collinear shared edge in one collection") {
    // A overlaps B; C shares a full edge with A (collinear, same line)
    val in: MultiPolygon = IndexedSeq(
      part(rect(0, 0, 10, 10)),
      part(rect(5, 5, 15, 15)),
      part(rect(10, 0, 20, 5))) // touches A along x=10, below B's overlap zone
    val out = PolyUnion.union(in)
    // 100 + 100 − 25 + 50 (C disjoint-interior, edge-touching)
    assert(math.abs(planarArea(out) - 225.0) < 1e-6)
    assertRegionEquals(in, out)
  }

  test("rotated square crossing a rect: non-axis-aligned proper intersections") {
    val diamond = ring((10, 0), (20, 10), (10, 20), (0, 10), (10, 0))
    val in: MultiPolygon = IndexedSeq(part(diamond), part(rect(-5, 8, 25, 12)))
    val out = PolyUnion.union(in)
    assert(out.length == 1)
    assertRegionEquals(in, out)
    // diamond area 200, slab 30×4=120, intersection is the slab clipped to
    // the diamond: width at |y−10| = 20−2|y−10| → ints = ∫(20−2t)dt·2 over
    // t∈[0,2]... compute numerically instead: MC, via region check only
    val a = planarArea(out)
    assert(a > 200.0 && a < 320.0, s"area $a outside sane bounds")
  }

  test("vertex-on-edge touch: triangle tip resting on a rect edge") {
    val tri = ring((5, 10), (8, 16), (2, 16), (5, 10)) // tip touches y=10 edge
    val in: MultiPolygon = IndexedSeq(part(rect(0, 0, 10, 10)), part(tri))
    val out = PolyUnion.union(in)
    // disjoint interiors: both survive; area exact
    assert(math.abs(planarArea(out) - (100.0 + 18.0)) < 1e-6)
    assertRegionEquals(in, out)
  }

  test("chain of three: A overlaps B overlaps C (transitive merge into one ring)") {
    val in: MultiPolygon = IndexedSeq(
      part(rect(0, 0, 10, 10)), part(rect(8, 0, 18, 10)), part(rect(16, 0, 26, 10)))
    val out = PolyUnion.union(in)
    assert(out.length == 1)
    // 3·100 − 2·(2·10)
    assert(math.abs(planarArea(out) - 260.0) < 1e-6)
    assertRegionEquals(in, out)
  }

  test("scale smoke: 15x15 grid of slightly-overlapping parts unions in bounded time") {
    // dissolve-sized input (225 parts, ~2k edges after splitting): the
    // sort-sweep pair prune + grid-distributed geometry must stay far from
    // the O(E^2) worst case
    val in: MultiPolygon = (for { i <- 0 until 15; j <- 0 until 15 } yield
      part(rect(i * 10, j * 10, i * 10 + 11, j * 10 + 11))).toIndexedSeq
    val t0 = System.nanoTime()
    val out = PolyUnion.union(in)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.length == 1, s"grid should merge into one region, got ${out.length}")
    // region = 151x151 minus nothing (overlaps fill the seams)
    assert(math.abs(planarArea(out) - 151.0 * 151.0) < 1e-4)
    assert(secs < 20.0, s"union took ${secs}s — pair pruning regressed")
  }

  test("property: random overlapping rectangles match the MC region oracle") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 20) {
      val k = 2 + rnd.nextInt(4)
      val in: MultiPolygon = (0 until k).map { _ =>
        val x = rnd.nextDouble() * 20; val y = rnd.nextDouble() * 20
        val w = 2 + rnd.nextDouble() * 10; val h = 2 + rnd.nextDouble() * 10
        part(rect(x, y, x + w, y + h))
      }.toIndexedSeq
      val out = PolyUnion.union(in)
      assertRegionEquals(in, out, seed = trial, n = 1500)
      // union area never exceeds the concat sum and never undershoots max part
      val sum = in.map(p => Geo.ringAreaPlanarDeg2(p.head)).sum
      val mx = in.map(p => Geo.ringAreaPlanarDeg2(p.head)).max
      val a = planarArea(out)
      assert(a <= sum + 1e-6 && a >= mx - 1e-6, s"trial $trial area $a out of [$mx, $sum]")
    }
  }

  test("property: random rotated convex n-gons match the MC region oracle") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 20) {
      val k = 2 + rnd.nextInt(3)
      val in: MultiPolygon = (0 until k).map { _ =>
        val n = 3 + rnd.nextInt(6)
        val cx = rnd.nextDouble() * 20; val cy = rnd.nextDouble() * 20
        val rad = 3 + rnd.nextDouble() * 6
        val rot = rnd.nextDouble() * 2 * math.Pi
        val pts = (0 until n).map { i =>
          val ang = rot + 2 * math.Pi * i / n
          (cx + rad * math.cos(ang), cy + rad * math.sin(ang))
        }
        part((pts :+ pts.head).toIndexedSeq)
      }.toIndexedSeq
      val out = PolyUnion.union(in)
      assertRegionEquals(in, out, seed = 100 + trial, n = 1500)
      val sum = in.map(p => Geo.ringAreaPlanarDeg2(p.head)).sum
      val mx = in.map(p => Geo.ringAreaPlanarDeg2(p.head)).max
      val a = planarArea(out)
      assert(a <= sum + 1e-6 && a >= mx - 1e-6, s"trial $trial area $a out of [$mx, $sum]")
    }
  }

  // ------------------------------------------------------------- makeValid

  test("makeValid: bowtie splits into its two lobes (even-odd / linework semantics)") {
    // figure-8: (0,0)→(10,8)→(10,0)→(0,8) — diagonals cross at (5,4)
    val bowtie = ring((0, 0), (10, 8), (10, 0), (0, 8), (0, 0))
    val out = PolyUnion.makeValid(IndexedSeq(part(bowtie)))
    assert(out.length == 2, s"expected 2 lobes, got ${out.length}: $out")
    // each lobe is a triangle of area w·h/4 = 20; total 40
    assert(math.abs(planarArea(out) - 40.0) < 1e-6, s"area ${planarArea(out)}")
    assertRegionEquals(IndexedSeq(part(bowtie)), out)
    // output must be valid: closed rings, CCW exteriors
    out.foreach { p =>
      assert(p.head.head == p.head.last, "ring not closed")
      assert(Geo.ringAreaPlanarDeg2(p.head) > 0, "exterior not CCW-oriented")
    }
  }

  test("makeValid: valid input passes through geometrically unchanged") {
    val in: MultiPolygon = IndexedSeq(part(rect(0, 0, 10, 10), // with a hole
      ring((3, 3), (3, 7), (7, 7), (7, 3), (3, 3)))) // CW interior ring
    val out = PolyUnion.makeValid(in)
    assert(out.length == 1)
    assert(out.head.length == 2, s"hole must survive: ${out.head.length} rings")
    assert(math.abs(planarArea(out) - 84.0) < 1e-6, s"area ${planarArea(out)}")
    assertRegionEquals(in, out)
  }

  test("makeValid: overlapping parts of an invalid multipolygon dissolve to their union") {
    val in: MultiPolygon = IndexedSeq(part(rect(0, 0, 10, 10)), part(rect(5, 5, 15, 15)))
    val out = PolyUnion.makeValid(in)
    assert(out.length == 1)
    assert(math.abs(planarArea(out) - 175.0) < 1e-6, s"area ${planarArea(out)}")
    assertRegionEquals(in, out)
  }

  test("makeValid property: random self-intersecting closed polylines rebuild to the even-odd region") {
    for (trial <- 0 until 12) {
      val rnd = new scala.util.Random(4000 + trial)
      // a random closed polyline — almost surely self-intersecting for
      // n >= 5 random vertices, exercising the arrangement on bowties,
      // multi-crossings and near-degenerate turns
      val n = 5 + rnd.nextInt(6)
      val pts = (0 until n).map(_ =>
        (rnd.nextDouble() * 20, rnd.nextDouble() * 20))
      val in: MultiPolygon = IndexedSeq(part((pts :+ pts.head).toIndexedSeq))
      val out = PolyUnion.makeValid(in)
      // the output region must equal even-odd membership of the INPUT ring
      // (assertRegionEquals probes exactly that: pointInPolygon is the
      // even-odd ray cast)
      assertRegionEquals(in, out, seed = 8000 + trial, n = 1500)
      // and the output must be structurally valid: closed, oriented rings
      out.foreach { poly =>
        assert(poly.head.head == poly.head.last, s"trial $trial: ring not closed")
        assert(Geo.ringAreaPlanarDeg2(poly.head) > 0,
          s"trial $trial: exterior not CCW")
        poly.drop(1).foreach(h =>
          assert(Geo.ringAreaPlanarDeg2(h) < 0, s"trial $trial: hole not CW"))
      }
    }
  }

  test("makeValid: zero-width spike collapses, area preserved") {
    // square with a degenerate spike poking out along an edge
    val spiked = ring((0, 0), (10, 0), (10, 5), (14, 5), (10, 5), (10, 10), (0, 10), (0, 0))
    val out = PolyUnion.makeValid(IndexedSeq(part(spiked)))
    assert(out.length == 1, s"one part expected: $out")
    assert(math.abs(planarArea(out) - 100.0) < 1e-6, s"area ${planarArea(out)}")
    // the spike vertex must be gone
    assert(!out.head.head.exists { case (x, _) => x > 10 + 1e-9 }, s"spike survived: ${out.head}")
  }
}

package graft.geo

import scala.collection.mutable

/** Exact-region n-ary polygon union — the `ST_UnaryUnion(ST_Collect(geom))`
  * analog (sql/ref/00_ref_geo_prepare.sql:57, api/app/main.py:699-710) for
  * the dissolve path when input parts overlap (the concat stand-in is only
  * correct for disjoint parts).
  *
  * Algorithm (arrangement + boundary filter + ring assembly):
  *  1. collect every ring edge of every part; split all edges at pairwise
  *     intersections (proper crossings, endpoint touches, collinear
  *     overlaps) so no two subsegments cross;
  *  2. keep a subsegment iff it separates covered from uncovered space
  *     (point-in-any-part test on either side of its midpoint), oriented so
  *     the covered region lies on its LEFT; stacked duplicate boundaries
  *     dedup to one copy;
  *  3. stitch directed segments into rings (at junctions take the most-
  *     counterclockwise continuation, which keeps the traced face on the
  *     left); CCW rings are exteriors, CW rings are holes, holes attach to
  *     their smallest containing exterior.
  *
  * Numerical model: double arithmetic with relative tolerances — the
  * coverage side-probe offset is 1e-7·scale, so features (slivers, gaps)
  * thinner than ~1e-7·scale (≈ 1 m at continental degree coordinates) may
  * be misclassified; the reference's GEOS union is exact-rational and
  * immune. Documented divergence; the dissolve caller only routes keys here
  * whose parts genuinely overlap.
  *
  * Complexity: O(E·k + C) where E = edges, k = candidates from a sort-sweep
  * bbox prune, C = coverage tests (2 per subsegment × parts). Runs per
  * dissolve KEY inside an executor task — dimension-sized inputs (the
  * reference dissolves ≤5 570 municipality geometries into ≤27 UFs).
  */
object PolyUnion {
  import Geo.{MultiPolygon, Point, Polygon, Ring}

  private final case class Seg(x1: Double, y1: Double, x2: Double, y2: Double) {
    def minX: Double = math.min(x1, x2)
    def maxX: Double = math.max(x1, x2)
    def minY: Double = math.min(y1, y2)
    def maxY: Double = math.max(y1, y2)
  }

  /** Union of all polygon parts of `mp` (each part = exterior + holes).
    * Returns a well-oriented multipolygon covering exactly the set of points
    * contained in at least one input part.
    */
  def union(mp: MultiPolygon): MultiPolygon = {
    val parts = mp.filter(p => p.nonEmpty && p.head.length >= 3)
    if (parts.isEmpty) return IndexedSeq.empty
    // single VALID part needs no arrangement; union's contract assumes
    // valid inputs (makeValid is the entry point that never shortcuts)
    if (parts.length == 1) return IndexedSeq(parts.head)
    rebuild(parts)
  }

  /** `ST_MakeValid` analog (sqlm/marts/prereq/010_mv_uf_geom_mainland
    * .sql:5-9, 020_…:5, api/app/main.py:704-732): rebuild a possibly
    * invalid (multi)polygon into a well-oriented valid one by running the
    * same arrangement the union uses — node every self-intersection, keep
    * the subsegments separating covered from uncovered space, re-assemble
    * rings. Coverage is the even-odd ray-cast, so a bowtie splits into its
    * two lobes and a doubly-wound region is excluded — the semantics of
    * PostGIS's default (linework) method; overlapping parts of an invalid
    * multipolygon dissolve into their union. Valid inputs pass through
    * geometrically unchanged (rings may be renoded/reoriented). Spikes and
    * zero-width slivers thinner than the 1e-7·scale probe offset collapse
    * (documented divergence from GEOS's exact-rational build, as for
    * [[union]]).
    */
  def makeValid(mp: MultiPolygon): MultiPolygon = {
    val parts = mp.filter(p => p.nonEmpty && p.head.length >= 3)
    if (parts.isEmpty) return IndexedSeq.empty
    rebuild(parts)
  }

  /** The arrangement + boundary-filter + ring-assembly core shared by
    * [[union]] and [[makeValid]]. */
  private def rebuild(parts: IndexedSeq[Polygon]): MultiPolygon = {
    // ---- scale-relative tolerances
    var scale = 1.0
    parts.foreach(_.foreach(_.foreach { case (x, y) =>
      scale = math.max(scale, math.max(math.abs(x), math.abs(y)))
    }))
    val eps = 1e-12 * scale   // coincidence / collinearity snap
    val off = 1e-7 * scale    // side-probe offset for coverage

    // ---- 1. gather edges (all rings: exteriors and holes)
    val edges = mutable.ArrayBuffer.empty[Seg]
    parts.foreach(_.foreach { ring =>
      val pts = if (ring.length > 1 && ring.head == ring.last) ring.dropRight(1) else ring
      val n = pts.length
      var i = 0
      while (i < n) {
        val (ax, ay) = pts(i)
        val (bx, by) = pts((i + 1) % n)
        if (math.abs(ax - bx) > eps || math.abs(ay - by) > eps)
          edges += Seg(ax, ay, bx, by)
        i += 1
      }
    })

    // ---- 2. split every edge at its intersections with the others.
    // sort-sweep on minX prunes the pair scan.
    val order = edges.indices.sortBy(i => edges(i).minX)
    val cuts = Array.fill(edges.length)(mutable.ArrayBuffer.empty[Double]) // params t in (0,1)

    def addCut(i: Int, t: Double): Unit =
      if (t > 1e-12 && t < 1 - 1e-12) cuts(i) += t

    def cross(ox: Double, oy: Double, ax: Double, ay: Double, bx: Double, by: Double): Double =
      (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

    var ii = 0
    while (ii < order.length) {
      val i = order(ii)
      val a = edges(i)
      var jj = ii + 1
      while (jj < order.length && edges(order(jj)).minX <= a.maxX + eps) {
        val j = order(jj)
        val b = edges(j)
        if (b.minY <= a.maxY + eps && a.minY <= b.maxY + eps) {
          val d1x = a.x2 - a.x1; val d1y = a.y2 - a.y1
          val d2x = b.x2 - b.x1; val d2y = b.y2 - b.y1
          val denom = d1x * d2y - d1y * d2x
          val c1 = cross(a.x1, a.y1, a.x2, a.y2, b.x1, b.y1) // b1 vs a
          val c2 = cross(a.x1, a.y1, a.x2, a.y2, b.x2, b.y2)
          if (math.abs(denom) > eps * eps) {
            // non-parallel: solve a1 + t·d1 = b1 + u·d2 (cross-product form)
            val ex = b.x1 - a.x1; val ey = b.y1 - a.y1
            val t = (ex * d2y - ey * d2x) / denom
            val u = (ex * d1y - ey * d1x) / denom
            if (t > -1e-12 && t < 1 + 1e-12 && u > -1e-12 && u < 1 + 1e-12) {
              addCut(i, t); addCut(j, u)
            }
          } else if (math.abs(c1) <= eps * math.max(1.0, scale) &&
                     math.abs(c2) <= eps * math.max(1.0, scale)) {
            // collinear: project each other's endpoints
            val len2a = d1x * d1x + d1y * d1y
            val len2b = d2x * d2x + d2y * d2y
            if (len2a > 0) {
              addCut(i, ((b.x1 - a.x1) * d1x + (b.y1 - a.y1) * d1y) / len2a)
              addCut(i, ((b.x2 - a.x1) * d1x + (b.y2 - a.y1) * d1y) / len2a)
            }
            if (len2b > 0) {
              addCut(j, ((a.x1 - b.x1) * d2x + (a.y1 - b.y1) * d2y) / len2b)
              addCut(j, ((a.x2 - b.x1) * d2x + (a.y2 - b.y1) * d2y) / len2b)
            }
          }
        }
        jj += 1
      }
      ii += 1
    }

    // ---- 3. boundary filter: keep covered|uncovered separators, interior left
    // per-part bbox prefilter: probes near one part's boundary must not pay a
    // full point-in-ring scan of every OTHER part's vertices — without this
    // the stage is O(subsegments × parts × vertices) on dense layers
    val partBoxes = parts.map(p => Geo.bboxOfRing(p.head))
    def covered(x: Double, y: Double): Boolean = {
      var i = 0
      while (i < parts.length) {
        if (partBoxes(i).contains(x, y) && Geo.pointInPolygon(x, y, parts(i))) return true
        i += 1
      }
      false
    }

    val snapScale = 1e9 / scale
    def snap(x: Double, y: Double): (Long, Long) =
      (math.round(x * snapScale), math.round(y * snapScale))

    val kept = mutable.LinkedHashMap.empty[((Long, Long), (Long, Long)), (Point, Point)]
    var ei = 0
    while (ei < edges.length) {
      val e = edges(ei)
      val ts = (cuts(ei) += 0.0) += 1.0
      val sorted = ts.distinct.sorted
      var si = 0
      while (si < sorted.length - 1) {
        val t0 = sorted(si); val t1 = sorted(si + 1)
        if (t1 - t0 > 1e-12) {
          val ax = e.x1 + (e.x2 - e.x1) * t0; val ay = e.y1 + (e.y2 - e.y1) * t0
          val bx = e.x1 + (e.x2 - e.x1) * t1; val by = e.y1 + (e.y2 - e.y1) * t1
          val mx = (ax + bx) / 2; val my = (ay + by) / 2
          val dx = bx - ax; val dy = by - ay
          val len = math.hypot(dx, dy)
          if (len > eps) {
            val nx = -dy / len; val ny = dx / len // left normal
            val covL = covered(mx + nx * off, my + ny * off)
            val covR = covered(mx - nx * off, my - ny * off)
            if (covL != covR) {
              // orient covered side to the left
              val (p1, p2) = if (covL) ((ax, ay), (bx, by)) else ((bx, by), (ax, ay))
              val key = (snap(p1._1, p1._2), snap(p2._1, p2._2))
              if (key._1 != key._2 && !kept.contains(key)) kept(key) = (p1, p2)
            }
          }
        }
        si += 1
      }
      ei += 1
    }
    if (kept.isEmpty) return IndexedSeq.empty

    // ---- 4. ring assembly: most-counterclockwise continuation keeps the
    // traced face (the union interior) on the left
    type SnapPt = (Long, Long)
    type SegKey = (SnapPt, SnapPt)
    val outgoing = mutable.HashMap.empty[SnapPt, mutable.ArrayBuffer[(SegKey, (Point, Point))]]
    kept.foreach { case (key, seg) =>
      outgoing.getOrElseUpdate(key._1, mutable.ArrayBuffer.empty[(SegKey, (Point, Point))]) += ((key, seg))
    }
    val used = mutable.HashSet.empty[((Long, Long), (Long, Long))]

    def angle(dx: Double, dy: Double): Double = math.atan2(dy, dx)

    val rings = mutable.ArrayBuffer.empty[Ring]
    kept.foreach { case (startKey, _) =>
      if (!used.contains(startKey)) {
        val ringPts = mutable.ArrayBuffer.empty[Point]
        val traceSegs = mutable.ArrayBuffer.empty[SegKey]
        var curKey = startKey
        var cur = kept(curKey)
        var ok = true
        val guard = kept.size + 1
        var steps = 0
        while (ok && steps <= guard) {
          used += curKey
          traceSegs += curKey
          ringPts += cur._1
          val endSnap = curKey._2
          if (endSnap == startKey._1) {
            // closed
            ok = false
          } else {
            val cands = outgoing.getOrElse(endSnap, mutable.ArrayBuffer.empty)
              .filter { case (k, _) => !used.contains(k) }
            if (cands.isEmpty) {
              // dead end: release this trace's segments so rings that need
              // them can still form from a different start (a consumed-but-
              // unringed segment would otherwise silently under-cover)
              traceSegs.foreach(used -= _)
              ringPts.clear(); ok = false
            }
            else {
              // incoming direction reversed
              val inAng = angle(cur._1._1 - cur._2._1, cur._1._2 - cur._2._2)
              val next = cands.maxBy { case (_, (p1, p2)) =>
                val a = angle(p2._1 - p1._1, p2._2 - p1._2) - inAng
                val norm = a - 2 * math.Pi * math.floor(a / (2 * math.Pi))
                norm // largest CCW turn from the reversed incoming direction
              }
              curKey = next._1
              cur = next._2
            }
          }
          steps += 1
        }
        if (ringPts.length >= 3) {
          val r = (ringPts :+ ringPts.head).toIndexedSeq
          rings += r
        }
      }
    }

    // ---- 5. classify exteriors (CCW) vs holes (CW), attach holes
    def signedArea(r: Ring): Double = {
      var s = 0.0
      var i = 0
      val n = r.length - 1
      while (i < n) {
        s += r(i)._1 * r(i + 1)._2 - r(i + 1)._1 * r(i)._2
        i += 1
      }
      s / 2
    }
    val exteriors = mutable.ArrayBuffer.empty[(Ring, Double)]
    val holes = mutable.ArrayBuffer.empty[Ring]
    rings.foreach { r =>
      val a = signedArea(r)
      if (a > 0) exteriors += ((r, a)) else if (a < 0) holes += r
    }
    if (exteriors.isEmpty) return IndexedSeq.empty
    val polys = exteriors.map(e => mutable.ArrayBuffer[Ring](e._1))
    holes.foreach { h =>
      // attach to the smallest exterior containing the hole. Probe with
      // EDGE MIDPOINTS, not a vertex: at a pinch/tangency the hole's
      // vertex can lie exactly ON the exterior ring, where the ray cast's
      // verdict is implementation-defined and the hole could silently
      // drop (over-covering its area). A snapped-vertex tangency never
      // puts a whole hole EDGE on the exterior, so some midpoint is
      // strictly interior; take the first midpoint that attaches, falling
      // back to the head vertex for degenerate rings.
      val probes = (0 until h.length - 1).iterator
        .map(i => ((h(i)._1 + h(i + 1)._1) / 2, (h(i)._2 + h(i + 1)._2) / 2)) ++
        Iterator.single(h.head)
      val idx = probes
        .map { case (px, py) =>
          exteriors.zipWithIndex
            .filter { case ((ext, _), _) => Geo.pointInRing(px, py, ext) }
            .sortBy(_._1._2)
            .headOption.map(_._2)
        }
        .collectFirst { case Some(i) => i }
      idx.foreach(i => polys(i) += h)
    }
    polys.map(_.toIndexedSeq).toIndexedSeq
  }
}

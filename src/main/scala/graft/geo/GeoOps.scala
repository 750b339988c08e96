package graft.geo

import scala.collection.mutable.ArrayBuffer

/** Planar geometry algorithms: centroid, area, distance, intersects,
  * intersection, and (de)serialization to GeoJSON / WKT.
  *
  * Semantics mirror what the reference's query surface relies on
  * (DuckDB spatial, planar): boundary points count as intersecting,
  * distance is min euclidean distance in coordinate units, centroid is
  * the true geometric centroid (area-weighted for polygons,
  * length-weighted for lines).
  */
object GeoOps {

  // ───────────────────────── area / centroid ─────────────────────────

  /** Signed shoelace area of a ring (positive = CCW). */
  def signedRingArea(ring: IndexedSeq[Pt]): Double = {
    var s = 0.0
    var i = 0
    val n = ring.length
    while (i < n - 1) {
      s += ring(i).x * ring(i + 1).y - ring(i + 1).x * ring(i).y
      i += 1
    }
    // be tolerant of unclosed rings
    if (n > 1 && ring(0) != ring(n - 1))
      s += ring(n - 1).x * ring(0).y - ring(0).x * ring(n - 1).y
    s / 2.0
  }

  def area(g: Geometry): Double = g match {
    case Polygon(rings) if rings.nonEmpty =>
      math.abs(signedRingArea(rings.head)) - rings.tail.map(r => math.abs(signedRingArea(r))).sum
    case MultiPolygon(ps)       => ps.map(area).sum
    case GeometryCollection(gs) => gs.map(area).sum
    case _                      => 0.0
  }

  def length(g: Geometry): Double = g match {
    case LineString(pts) =>
      var s = 0.0; var i = 0
      while (i < pts.length - 1) { s += dist(pts(i), pts(i + 1)); i += 1 }
      s
    case MultiLineString(ls)    => ls.map(length).sum
    case GeometryCollection(gs) => gs.map(length).sum
    case _                      => 0.0
  }

  /** (cx*w, cy*w, w) of a ring weighted by signed area (shoelace centroid). */
  private def ringCentroidW(ring: IndexedSeq[Pt]): (Double, Double, Double) = {
    var cx = 0.0; var cy = 0.0; var a = 0.0
    val n = ring.length
    var i = 0
    def term(p0: Pt, p1: Pt): Unit = {
      val cross = p0.x * p1.y - p1.x * p0.y
      a += cross
      cx += (p0.x + p1.x) * cross
      cy += (p0.y + p1.y) * cross
    }
    while (i < n - 1) { term(ring(i), ring(i + 1)); i += 1 }
    if (n > 1 && ring(0) != ring(n - 1)) term(ring(n - 1), ring(0))
    (cx / 6.0, cy / 6.0, a / 2.0)
  }

  /** True geometric centroid. Dimension hierarchy like PostGIS/DuckDB:
    * areal geometries use area weighting; if total area is 0 fall back
    * to length weighting; if that is 0, average the points.
    */
  def centroid(g: Geometry): Pt = {
    var ax = 0.0; var ay = 0.0; var aw = 0.0 // area-weighted
    var lx = 0.0; var ly = 0.0; var lw = 0.0 // length-weighted
    var px = 0.0; var py = 0.0; var pn = 0.0 // point average

    def visit(g: Geometry): Unit = g match {
      case Point(p) => px += p.x; py += p.y; pn += 1
      case MultiPoint(ps) => ps.foreach(visit)
      case LineString(pts) =>
        var i = 0
        while (i < pts.length - 1) {
          val d = dist(pts(i), pts(i + 1))
          lx += (pts(i).x + pts(i + 1).x) / 2.0 * d
          ly += (pts(i).y + pts(i + 1).y) / 2.0 * d
          lw += d
          i += 1
        }
        pts.foreach { p => px += p.x; py += p.y; pn += 1 }
      case MultiLineString(ls) => ls.foreach(visit)
      case Polygon(rings) =>
        // shell contributes its signed orientation; holes subtract.
        rings.zipWithIndex.foreach { case (r, i) =>
          val (cx, cy, a) = ringCentroidW(r)
          val sign = if (i == 0) { if (a < 0) -1.0 else 1.0 } else { if (a < 0) 1.0 else -1.0 }
          ax += cx * sign; ay += cy * sign; aw += a * sign
        }
        rings.headOption.foreach(_.foreach { p => px += p.x; py += p.y; pn += 1 })
      case MultiPolygon(ps)       => ps.foreach(visit)
      case GeometryCollection(gs) => gs.foreach(visit)
    }
    visit(g)
    if (aw != 0.0) Pt(ax / aw, ay / aw)
    else if (lw != 0.0) Pt(lx / lw, ly / lw)
    else if (pn != 0.0) Pt(px / pn, py / pn)
    else Pt(Double.NaN, Double.NaN)
  }

  // ───────────────────────── primitives ─────────────────────────

  def dist(a: Pt, b: Pt): Double = {
    val dx = a.x - b.x; val dy = a.y - b.y
    math.sqrt(dx * dx + dy * dy)
  }

  /** Min distance from point p to a linestring — tight index loop
    * over the vertex array, zero allocation (cf. the generic
    * `distance` path, which materializes segment tuples per call).
    * A single-vertex "line" degrades to point distance.
    */
  def pointLineDist(p: Pt, l: LineString): Double = {
    val pts = l.pts
    if (pts.length == 1) return dist(p, pts(0))
    var best = Double.PositiveInfinity
    var i = 0
    while (i < pts.length - 1) {
      val d = pointSegDist(p, pts(i), pts(i + 1))
      if (d < best) best = d
      i += 1
    }
    best
  }

  /** Min distance from point p to segment [a,b]. */
  def pointSegDist(p: Pt, a: Pt, b: Pt): Double = {
    val dx = b.x - a.x; val dy = b.y - a.y
    val l2 = dx * dx + dy * dy
    if (l2 == 0.0) return dist(p, a)
    var t = ((p.x - a.x) * dx + (p.y - a.y) * dy) / l2
    if (t < 0) t = 0 else if (t > 1) t = 1
    dist(p, Pt(a.x + t * dx, a.y + t * dy))
  }

  private def orient(a: Pt, b: Pt, c: Pt): Double =
    (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)

  private def onSegment(a: Pt, b: Pt, p: Pt): Boolean =
    orient(a, b, p) == 0.0 &&
      p.x >= math.min(a.x, b.x) && p.x <= math.max(a.x, b.x) &&
      p.y >= math.min(a.y, b.y) && p.y <= math.max(a.y, b.y)

  /** Segment-segment intersection test (touching counts). */
  def segIntersects(p1: Pt, p2: Pt, q1: Pt, q2: Pt): Boolean = {
    val d1 = orient(q1, q2, p1); val d2 = orient(q1, q2, p2)
    val d3 = orient(p1, p2, q1); val d4 = orient(p1, p2, q2)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) return true
    if (d1 == 0 && onSegment(q1, q2, p1)) return true
    if (d2 == 0 && onSegment(q1, q2, p2)) return true
    if (d3 == 0 && onSegment(p1, p2, q1)) return true
    if (d4 == 0 && onSegment(p1, p2, q2)) return true
    false
  }

  def segSegDist(p1: Pt, p2: Pt, q1: Pt, q2: Pt): Double = {
    if (segIntersects(p1, p2, q1, q2)) 0.0
    else math.min(
      math.min(pointSegDist(p1, q1, q2), pointSegDist(p2, q1, q2)),
      math.min(pointSegDist(q1, p1, p2), pointSegDist(q2, p1, p2)))
  }

  /** Ray-cast point-in-ring; boundary counts as inside. */
  def pointInRing(p: Pt, ring: IndexedSeq[Pt]): Boolean = {
    val n = ring.length
    if (n < 3) return false
    var inside = false
    var i = 0
    var j = if (ring(0) == ring(n - 1)) n - 2 else n - 1
    val m = if (ring(0) == ring(n - 1)) n - 1 else n
    while (i < m) {
      val a = ring(i); val b = ring(j)
      if (onSegment(a, b, p)) return true
      if ((a.y > p.y) != (b.y > p.y)) {
        val xCross = a.x + (p.y - a.y) / (b.y - a.y) * (b.x - a.x)
        if (p.x < xCross) inside = !inside
      }
      j = i; i += 1
    }
    inside
  }

  /** Point in polygon with holes; boundary (incl. hole boundary) counts. */
  def pointInPolygon(p: Pt, poly: Polygon): Boolean = {
    if (poly.isEmpty || !pointInRing(p, poly.shell)) return false
    // inside a hole (but not on its boundary) → outside
    poly.holes.forall { h =>
      !pointInRing(p, h) || h.sliding(2).exists(s => s.length == 2 && onSegment(s(0), s(1), p))
    }
  }

  // ───────────────── decomposition helpers ─────────────────

  private def segmentsOf(g: Geometry, out: ArrayBuffer[(Pt, Pt)]): Unit = g match {
    case LineString(pts) =>
      var i = 0
      while (i < pts.length - 1) { out += ((pts(i), pts(i + 1))); i += 1 }
    case Polygon(rings) =>
      rings.foreach { r =>
        var i = 0
        while (i < r.length - 1) { out += ((r(i), r(i + 1))); i += 1 }
        if (r.length > 1 && r(0) != r(r.length - 1)) out += ((r(r.length - 1), r(0)))
      }
    case MultiLineString(ls)    => ls.foreach(segmentsOf(_, out))
    case MultiPolygon(ps)       => ps.foreach(segmentsOf(_, out))
    case GeometryCollection(gs) => gs.foreach(segmentsOf(_, out))
    case _                      => ()
  }

  private def pointsOf(g: Geometry, out: ArrayBuffer[Pt]): Unit = g match {
    case Point(p)               => out += p
    case MultiPoint(ps)         => ps.foreach(pointsOf(_, out))
    case LineString(pts)        => out ++= pts
    case Polygon(rings)         => rings.foreach(out ++= _)
    case MultiLineString(ls)    => ls.foreach(pointsOf(_, out))
    case MultiPolygon(ps)       => ps.foreach(pointsOf(_, out))
    case GeometryCollection(gs) => gs.foreach(pointsOf(_, out))
  }

  private def polygonsOf(g: Geometry): Seq[Polygon] = g match {
    case p: Polygon             => Seq(p)
    case MultiPolygon(ps)       => ps
    case GeometryCollection(gs) => gs.flatMap(polygonsOf)
    case _                      => Nil
  }

  private def linesOf(g: Geometry): Seq[LineString] = g match {
    case l: LineString          => Seq(l)
    case MultiLineString(ls)    => ls
    case GeometryCollection(gs) => gs.flatMap(linesOf)
    case _                      => Nil
  }

  // ───────────────────────── intersects ─────────────────────────

  def intersects(a: Geometry, b: Geometry): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!a.envelope.intersects(b.envelope)) return false

    val segsA = new ArrayBuffer[(Pt, Pt)]; segmentsOf(a, segsA)
    val segsB = new ArrayBuffer[(Pt, Pt)]; segmentsOf(b, segsB)

    // 1. any edge pair crossing/touching
    var i = 0
    while (i < segsA.length) {
      var j = 0
      while (j < segsB.length) {
        if (segIntersects(segsA(i)._1, segsA(i)._2, segsB(j)._1, segsB(j)._2)) return true
        j += 1
      }
      i += 1
    }

    // 2. containment: any point of A strictly within a polygon of B (or v.v.)
    val polysA = polygonsOf(a); val polysB = polygonsOf(b)
    if (polysB.nonEmpty) {
      val ptsA = new ArrayBuffer[Pt]; pointsOf(a, ptsA)
      if (ptsA.exists(p => polysB.exists(pb => pointInPolygon(p, pb)))) return true
    }
    if (polysA.nonEmpty) {
      val ptsB = new ArrayBuffer[Pt]; pointsOf(b, ptsB)
      if (ptsB.exists(p => polysA.exists(pa => pointInPolygon(p, pa)))) return true
    }

    // 3. point-vs-segment: a (multi)point side has no edges of its
    // own, so case 1 never sees it — test its points against the other
    // side's segments directly
    if (segsA.isEmpty && polysA.isEmpty && segsB.nonEmpty) {
      val ptsA = new ArrayBuffer[Pt]; pointsOf(a, ptsA)
      return ptsA.exists(p => segsB.exists(s => onSegment(s._1, s._2, p)))
    }
    if (segsB.isEmpty && polysB.isEmpty && segsA.nonEmpty) {
      val ptsB = new ArrayBuffer[Pt]; pointsOf(b, ptsB)
      return ptsB.exists(p => segsA.exists(s => onSegment(s._1, s._2, p)))
    }

    // 4. pure point cases (no segments): point-point equality
    if (segsA.isEmpty && segsB.isEmpty && polysA.isEmpty && polysB.isEmpty) {
      val ptsA = new ArrayBuffer[Pt]; pointsOf(a, ptsA)
      val ptsB = new ArrayBuffer[Pt]; pointsOf(b, ptsB)
      return ptsA.exists(pa => ptsB.contains(pa))
    }
    false
  }

  // ───────────────────────── distance ─────────────────────────

  /** Min planar distance; 0 when geometries intersect (incl. one
    * containing the other).
    *
    * Point↔point and point↔linestring take allocation-free fast paths
    * (no segment/point buffer materialization, no up-front intersects
    * pass — a point touching the other geometry yields 0 from the
    * primitive itself). These are the shapes every distance join in
    * the query surface probes per candidate pair, so the per-pair
    * constant is the term that scales with the ×100 candidate growth.
    */
  def distance(a: Geometry, b: Geometry): Double = {
    if (a.isEmpty || b.isEmpty) return Double.NaN
    (a, b) match {
      case (p: Point, q: Point) => return dist(p.p, q.p)
      case (p: Point, l: LineString) => return pointLineDist(p.p, l)
      case (l: LineString, p: Point) => return pointLineDist(p.p, l)
      case _ => ()
    }
    if (intersects(a, b)) return 0.0

    val segsA = new ArrayBuffer[(Pt, Pt)]; segmentsOf(a, segsA)
    val segsB = new ArrayBuffer[(Pt, Pt)]; segmentsOf(b, segsB)
    val ptsA = new ArrayBuffer[Pt]; pointsOf(a, ptsA)
    val ptsB = new ArrayBuffer[Pt]; pointsOf(b, ptsB)

    var best = Double.PositiveInfinity
    if (segsA.nonEmpty && segsB.nonEmpty) {
      segsA.foreach { sa => segsB.foreach { sb =>
        val d = segSegDist(sa._1, sa._2, sb._1, sb._2); if (d < best) best = d
      } }
    } else if (segsA.nonEmpty) {
      ptsB.foreach { p => segsA.foreach { s =>
        val d = pointSegDist(p, s._1, s._2); if (d < best) best = d
      } }
    } else if (segsB.nonEmpty) {
      ptsA.foreach { p => segsB.foreach { s =>
        val d = pointSegDist(p, s._1, s._2); if (d < best) best = d
      } }
    } else {
      ptsA.foreach { pa => ptsB.foreach { pb =>
        val d = dist(pa, pb); if (d < best) best = d
      } }
    }
    best
  }

  // ───────────────────────── intersection ─────────────────────────

  /** Geometry intersection. Full support for the shapes the reference
    * exercises (AnalysisPanel.jsx:40-60 — polygon overlap rendering,
    * try/catch-wrapped and skippable): polygon ∩ polygon via
    * Sutherland–Hodgman against the clip shell when it is convex, and
    * against its ear-clipping triangulation otherwise (triangles
    * partition the clip region, so the piecewise clips form a disjoint
    * cover of the true intersection — exact area, seams along
    * triangulation edges in the returned MultiPolygon). Holes are not
    * clipped (the reference's overlap rendering never produces them).
    * Point ∩ any and line ∩ polygon are exact. Returns an empty
    * GeometryCollection when there is no intersection.
    */
  def intersection(a: Geometry, b: Geometry): Geometry = {
    val empty = GeometryCollection(IndexedSeq.empty)
    if (a.isEmpty || b.isEmpty || !a.envelope.intersects(b.envelope)) return empty
    (a, b) match {
      case (p: Point, g) => if (intersects(p, g)) p else empty
      case (g, p: Point) => if (intersects(p, g)) p else empty
      case (mp: MultiPoint, g) => multiPointIntersection(mp, g)
      case (g, mp: MultiPoint) => multiPointIntersection(mp, g)
      case (ga, gb)
          if polygonsOf(ga).isEmpty && polygonsOf(gb).isEmpty &&
            linesOf(ga).nonEmpty && linesOf(gb).nonEmpty =>
        lineLineIntersection(linesOf(ga), linesOf(gb))
      case (l: LineString, g) if polygonsOf(g).nonEmpty => clipLine(l, polygonsOf(g))
      case (g, l: LineString) if polygonsOf(g).nonEmpty => clipLine(l, polygonsOf(g))
      case (pa, pb) =>
        val polysA = polygonsOf(pa); val polysB = polygonsOf(pb)
        if (polysA.isEmpty || polysB.isEmpty) return empty
        val out = for {
          x <- polysA; y <- polysB
          clipRegion <- if (isConvexRing(y.shell)) Seq(y.shell)
                        else triangulate(y.shell).map(t => IndexedSeq(t._1, t._2, t._3, t._1))
          clipped = sutherlandHodgman(x.shell, clipRegion)
          if clipped.length >= 3 && math.abs(signedRingArea(close(clipped))) > 0
        } yield Polygon(IndexedSeq(close(clipped)))
        out match {
          case Seq()  => empty
          case Seq(p) => p
          case ps     => MultiPolygon(ps.toIndexedSeq)
        }
    }
  }

  /** MultiPoint ∩ anything: the member points lying on/in the other
    * geometry, deduplicated, in (x, y) order.
    */
  private def multiPointIntersection(mp: MultiPoint, g: Geometry): Geometry = {
    val hits = mp.points.map(_.p).distinct
      .filter(p => intersects(Point(p), g))
      .sortBy(p => (p.x, p.y))
    hits match {
      case Seq()  => GeometryCollection(IndexedSeq.empty)
      case Seq(p) => Point(p)
      case ps     => MultiPoint(ps.map(Point(_)).toIndexedSeq)
    }
  }

  /** Geometric intersection of two segments: `Left(pt)` for a proper
    * crossing or endpoint touch, `Right((a, b))` for a collinear
    * overlap of positive length, None when disjoint.
    */
  private def segSegIntersection(p1: Pt, p2: Pt, q1: Pt, q2: Pt): Option[Either[Pt, (Pt, Pt)]] = {
    val d1 = orient(q1, q2, p1); val d2 = orient(q1, q2, p2)
    val d3 = orient(p1, p2, q1); val d4 = orient(p1, p2, q2)
    if (d1 == 0 && d2 == 0 && d3 == 0 && d4 == 0) {
      // collinear: order along the dominant axis and take the overlap
      val useX = math.max(math.abs(p2.x - p1.x), math.abs(q2.x - q1.x)) >=
        math.max(math.abs(p2.y - p1.y), math.abs(q2.y - q1.y))
      def key(p: Pt): Double = if (useX) p.x else p.y
      val (a, b) = if (key(p1) <= key(p2)) (p1, p2) else (p2, p1)
      val (c, d) = if (key(q1) <= key(q2)) (q1, q2) else (q2, q1)
      val lo = if (key(a) >= key(c)) a else c
      val hi = if (key(b) <= key(d)) b else d
      if (key(lo) > key(hi)) None
      else if (lo == hi) Some(Left(lo))
      else Some(Right((lo, hi)))
    } else if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
               ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) {
      val denom = (p2.x - p1.x) * (q2.y - q1.y) - (p2.y - p1.y) * (q2.x - q1.x)
      val t = ((q1.x - p1.x) * (q2.y - q1.y) - (q1.y - p1.y) * (q2.x - q1.x)) / denom
      Some(Left(Pt(p1.x + t * (p2.x - p1.x), p1.y + t * (p2.y - p1.y))))
    } else {
      if (d1 == 0 && onSegment(q1, q2, p1)) Some(Left(p1))
      else if (d2 == 0 && onSegment(q1, q2, p2)) Some(Left(p2))
      else if (d3 == 0 && onSegment(p1, p2, q1)) Some(Left(q1))
      else if (d4 == 0 && onSegment(p1, p2, q2)) Some(Left(q2))
      else None
    }
  }

  /** Line ∩ line: crossing/touch points plus collinear-overlap
    * segments over all segment pairs; points already covered by an
    * overlap segment are dropped; deterministic (x, y) ordering.
    * O(|segs_a|·|segs_b|) per pair — feature-sized lines, and the
    * engine's join layer caps candidate pairs via the grid pre-filter.
    */
  private def lineLineIntersection(la: Seq[LineString], lb: Seq[LineString]): Geometry = {
    val pts = ArrayBuffer[Pt](); val segs = ArrayBuffer[(Pt, Pt)]()
    for {
      l1 <- la; l2 <- lb
      i <- 0 until l1.pts.length - 1
      j <- 0 until l2.pts.length - 1
    } segSegIntersection(l1.pts(i), l1.pts(i + 1), l2.pts(j), l2.pts(j + 1)) match {
      case Some(Left(p))  => pts += p
      case Some(Right(s)) => segs += s
      case None           => ()
    }
    val uniqSegs: Seq[(Pt, Pt)] =
      segs.distinct.sortBy(s => (s._1.x, s._1.y, s._2.x, s._2.y)).toSeq
    val uniqPts: Seq[Pt] = pts.distinct
      .filterNot(p => uniqSegs.exists { case (s1, s2) => onSegment(s1, s2, p) })
      .sortBy(p => (p.x, p.y)).toSeq
    val lineGeoms: Seq[LineString] =
      uniqSegs.map { case (s1, s2) => LineString(IndexedSeq(s1, s2)) }
    (uniqPts, lineGeoms) match {
      case (Seq(), Seq())  => GeometryCollection(IndexedSeq.empty)
      case (Seq(p), Seq()) => Point(p)
      case (ps, Seq())     => MultiPoint(ps.map(Point(_)).toIndexedSeq)
      case (Seq(), Seq(l)) => l
      case (Seq(), ls)     => MultiLineString(ls.toIndexedSeq)
      case (ps, ls) =>
        GeometryCollection((ls ++ ps.map(Point(_))).toIndexedSeq)
    }
  }

  /** Is the (closed or open) ring convex? Collinear runs allowed. */
  private[geo] def isConvexRing(ringIn: IndexedSeq[Pt]): Boolean = {
    val r = if (ringIn.nonEmpty && ringIn.head == ringIn.last) ringIn.dropRight(1) else ringIn
    if (r.length < 4) return true // triangles are convex
    var sign = 0
    var i = 0
    while (i < r.length) {
      val o = orient(r(i), r((i + 1) % r.length), r((i + 2) % r.length))
      if (o != 0) {
        val s = if (o > 0) 1 else -1
        if (sign == 0) sign = s
        else if (s != sign) return false
      }
      i += 1
    }
    true
  }

  /** Ear-clipping triangulation of a simple polygon ring (O(n²));
    * collinear vertices are dropped first, zero-area ears skipped.
    */
  private[geo] def triangulate(ringIn: IndexedSeq[Pt]): Seq[(Pt, Pt, Pt)] = {
    var r = (if (ringIn.nonEmpty && ringIn.head == ringIn.last) ringIn.dropRight(1) else ringIn).toBuffer
    // ensure CCW
    if (signedRingArea(close(r.toIndexedSeq)) < 0) r = r.reverse
    // drop exactly-collinear vertices (lattice data has many)
    var changed = true
    while (changed && r.length > 3) {
      changed = false
      var i = 0
      while (i < r.length && r.length > 3) {
        val prev = r((i + r.length - 1) % r.length)
        val next = r((i + 1) % r.length)
        if (orient(prev, r(i), next) == 0) { r.remove(i); changed = true } else i += 1
      }
    }
    val tris = ArrayBuffer[(Pt, Pt, Pt)]()
    var guard = r.length * r.length + 10
    while (r.length > 3 && guard > 0) {
      guard -= 1
      var i = 0
      var clippedOne = false
      while (i < r.length && !clippedOne) {
        val prev = r((i + r.length - 1) % r.length)
        val cur = r(i)
        val next = r((i + 1) % r.length)
        val convexCorner = orient(prev, cur, next) > 0
        if (convexCorner) {
          val triRing = IndexedSeq(prev, cur, next, prev)
          val containsOther = r.indices.exists { j =>
            val q = r(j)
            q != prev && q != cur && q != next && pointInRing(q, triRing)
          }
          if (!containsOther) {
            tris += ((prev, cur, next))
            r.remove(i)
            clippedOne = true
          }
        }
        i += 1
      }
      if (!clippedOne) guard = 0 // degenerate input — bail with what we have
    }
    if (r.length == 3) tris += ((r(0), r(1), r(2)))
    tris.toSeq
  }

  private def close(ring: IndexedSeq[Pt]): IndexedSeq[Pt] =
    if (ring.nonEmpty && ring.head != ring.last) ring :+ ring.head else ring

  /** Convex hull of a ring (Andrew monotone chain) — used to get a
    * convex clip region for Sutherland–Hodgman.
    */
  private def convexShell(p: Polygon): IndexedSeq[Pt] = {
    val pts = p.shell.distinct.sortBy(q => (q.x, q.y))
    if (pts.length <= 3) return close(pts)
    val lower = ArrayBuffer[Pt]()
    pts.foreach { q =>
      while (lower.length >= 2 && orient(lower(lower.length - 2), lower.last, q) <= 0) lower.remove(lower.length - 1)
      lower += q
    }
    val upper = ArrayBuffer[Pt]()
    pts.reverse.foreach { q =>
      while (upper.length >= 2 && orient(upper(upper.length - 2), upper.last, q) <= 0) upper.remove(upper.length - 1)
      upper += q
    }
    close((lower.dropRight(1) ++ upper.dropRight(1)).toIndexedSeq)
  }

  /** Sutherland–Hodgman: clip `subject` ring by convex ring `clip`
    * (CCW). Returns open ring.
    */
  private def sutherlandHodgman(subjectIn: IndexedSeq[Pt], clipRing: IndexedSeq[Pt]): IndexedSeq[Pt] = {
    var subject: IndexedSeq[Pt] =
      if (subjectIn.nonEmpty && subjectIn.head == subjectIn.last) subjectIn.dropRight(1) else subjectIn
    val clip = if (clipRing.nonEmpty && clipRing.head == clipRing.last) clipRing.dropRight(1) else clipRing
    if (clip.length < 3) return IndexedSeq.empty
    // ensure CCW clip
    val cl = if (signedRingArea(close(clip)) < 0) clip.reverse else clip
    var i = 0
    while (i < cl.length && subject.nonEmpty) {
      val a = cl(i); val b = cl((i + 1) % cl.length)
      val out = ArrayBuffer[Pt]()
      var j = 0
      while (j < subject.length) {
        val cur = subject(j)
        val prev = subject((j + subject.length - 1) % subject.length)
        val curIn = orient(a, b, cur) >= 0
        val prevIn = orient(a, b, prev) >= 0
        if (curIn) {
          if (!prevIn) out += lineIntersect(prev, cur, a, b)
          out += cur
        } else if (prevIn) {
          out += lineIntersect(prev, cur, a, b)
        }
        j += 1
      }
      subject = out.toIndexedSeq
      i += 1
    }
    subject
  }

  private def lineIntersect(p1: Pt, p2: Pt, a: Pt, b: Pt): Pt = {
    val a1 = p2.y - p1.y; val b1 = p1.x - p2.x
    val c1 = a1 * p1.x + b1 * p1.y
    val a2 = b.y - a.y; val b2 = a.x - b.x
    val c2 = a2 * a.x + b2 * a.y
    val det = a1 * b2 - a2 * b1
    if (det == 0) p1 else Pt((b2 * c1 - b1 * c2) / det, (a1 * c2 - a2 * c1) / det)
  }

  /** Clip a linestring to a set of polygons (keeps pieces inside any). */
  private def clipLine(l: LineString, polys: Seq[Polygon]): Geometry = {
    // sample-based: keep segments whose midpoint+endpoints are inside.
    val pieces = ArrayBuffer[IndexedSeq[Pt]]()
    val cur = ArrayBuffer[Pt]()
    def flush(): Unit = { if (cur.length >= 2) pieces += cur.toIndexedSeq; cur.clear() }
    var i = 0
    while (i < l.pts.length - 1) {
      val a = l.pts(i); val b = l.pts(i + 1)
      val mid = Pt((a.x + b.x) / 2, (a.y + b.y) / 2)
      val in = polys.exists(p => pointInPolygon(a, p)) &&
        polys.exists(p => pointInPolygon(b, p)) &&
        polys.exists(p => pointInPolygon(mid, p))
      if (in) { if (cur.isEmpty) cur += a; cur += b } else flush()
      i += 1
    }
    flush()
    pieces.toIndexedSeq match {
      case IndexedSeq()  => GeometryCollection(IndexedSeq.empty)
      case IndexedSeq(p) => LineString(p)
      case ps            => MultiLineString(ps.map(LineString(_)))
    }
  }

  // ───────────────────────── serialization ─────────────────────────

  /** JSON-number formatting: integral doubles print without the
    * trailing ".0" (GeoJSON-conventional), everything else uses the
    * shortest round-trip representation.
    */
  def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def coords(p: Pt): String = s"[${fmt(p.x)},${fmt(p.y)}]"
  private def coordsList(pts: Iterable[Pt]): String = pts.map(coords).mkString("[", ",", "]")

  def toGeoJson(g: Geometry): String = g match {
    case Point(p)        => s"""{"type":"Point","coordinates":${coords(p)}}"""
    case LineString(pts) => s"""{"type":"LineString","coordinates":${coordsList(pts)}}"""
    case Polygon(rings) =>
      s"""{"type":"Polygon","coordinates":${rings.map(r => coordsList(close(r))).mkString("[", ",", "]")}}"""
    case MultiPoint(ps) =>
      s"""{"type":"MultiPoint","coordinates":${ps.map(p => coords(p.p)).mkString("[", ",", "]")}}"""
    case MultiLineString(ls) =>
      s"""{"type":"MultiLineString","coordinates":${ls.map(l => coordsList(l.pts)).mkString("[", ",", "]")}}"""
    case MultiPolygon(ps) =>
      s"""{"type":"MultiPolygon","coordinates":${ps
          .map(p => p.rings.map(r => coordsList(close(r))).mkString("[", ",", "]"))
          .mkString("[", ",", "]")}}"""
    case GeometryCollection(gs) =>
      s"""{"type":"GeometryCollection","geometries":${gs.map(toGeoJson).mkString("[", ",", "]")}}"""
  }

  def toWkt(g: Geometry): String = {
    def ring(pts: Iterable[Pt]): String = pts.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString("(", ", ", ")")
    g match {
      case Point(p)        => s"POINT (${fmt(p.x)} ${fmt(p.y)})"
      case LineString(pts) => if (pts.isEmpty) "LINESTRING EMPTY" else s"LINESTRING ${ring(pts)}"
      case Polygon(rings)  =>
        if (rings.isEmpty) "POLYGON EMPTY"
        else s"POLYGON ${rings.map(r => ring(close(r))).mkString("(", ", ", ")")}"
      case MultiPoint(ps) =>
        if (ps.isEmpty) "MULTIPOINT EMPTY"
        else s"MULTIPOINT ${ps.map(p => s"(${fmt(p.p.x)} ${fmt(p.p.y)})").mkString("(", ", ", ")")}"
      case MultiLineString(ls) =>
        if (ls.isEmpty) "MULTILINESTRING EMPTY"
        else s"MULTILINESTRING ${ls.map(l => ring(l.pts)).mkString("(", ", ", ")")}"
      case MultiPolygon(ps) =>
        if (ps.isEmpty) "MULTIPOLYGON EMPTY"
        else s"MULTIPOLYGON ${ps.map(p => p.rings.map(r => ring(close(r))).mkString("(", ", ", ")")).mkString("(", ", ", ")")}"
      case GeometryCollection(gs) =>
        if (gs.isEmpty) "GEOMETRYCOLLECTION EMPTY"
        else s"GEOMETRYCOLLECTION (${gs.map(toWkt).mkString(", ")})"
    }
  }

  /** Minimal WKT parser (the subset our fixtures and tests use). */
  def fromWkt(wkt: String): Geometry = {
    val s = wkt.trim
    val upper = s.toUpperCase
    def body(prefix: String): String = s.substring(prefix.length).trim
    def parsePts(t: String): IndexedSeq[Pt] =
      t.stripPrefix("(").stripSuffix(")").split(",").toIndexedSeq.map { pair =>
        val xs = pair.trim.split("\\s+")
        Pt(xs(0).toDouble, xs(1).toDouble)
      }
    def splitTop(t: String): Seq[String] = {
      // split top-level comma-separated parenthesized groups
      val inner = t.trim.stripPrefix("(").stripSuffix(")")
      val parts = ArrayBuffer[String]()
      var depth = 0; val cur = new StringBuilder
      inner.foreach {
        case '(' => depth += 1; cur += '('
        case ')' => depth -= 1; cur += ')'
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case c => cur += c
      }
      if (cur.nonEmpty) parts += cur.toString
      parts.toSeq.map(_.trim)
    }
    if (upper.startsWith("POINT")) {
      val pts = parsePts(body("POINT")); Point(pts.head)
    } else if (upper.startsWith("LINESTRING")) {
      LineString(parsePts(body("LINESTRING")))
    } else if (upper.startsWith("POLYGON")) {
      Polygon(splitTop(body("POLYGON")).toIndexedSeq.map(parsePts))
    } else if (upper.startsWith("MULTIPOINT")) {
      MultiPoint(splitTop(body("MULTIPOINT")).toIndexedSeq.map(g => Point(parsePts(g).head)))
    } else if (upper.startsWith("MULTILINESTRING")) {
      MultiLineString(splitTop(body("MULTILINESTRING")).toIndexedSeq.map(g => LineString(parsePts(g))))
    } else if (upper.startsWith("MULTIPOLYGON")) {
      MultiPolygon(splitTop(body("MULTIPOLYGON")).toIndexedSeq.map(g => Polygon(splitTop(g).toIndexedSeq.map(parsePts))))
    } else {
      throw new IllegalArgumentException(s"unsupported WKT: ${s.take(40)}")
    }
  }
}

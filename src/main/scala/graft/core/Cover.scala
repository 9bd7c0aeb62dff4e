package graft.core

import scala.collection.mutable.ArrayBuffer

/** Cover generation: the set of level-L trixels intersecting a spherical
  * region (polygon ring with winding-based interior, spherical cap).
  *
  * Reference behavior reproduced (pystare.cover_from_ring as used by
  * /root/reference/starepandas/tools/spatial_conversions.py:273-361):
  * multi-resolution output — a trixel fully inside the region is emitted
  * at the coarsest depth at which it is fully contained (greedy, no
  * sibling merging), trixels intersecting the boundary are emitted at
  * the requested level; ascending sid order (depth-first face 0..7 /
  * child 0..3 emission); region = area left of the directed ring edges
  * (orientation matters: clockwise rings denote the complement — that is
  * how polygon holes are carved out via cover intersection). The greedy
  * emission rule was pinned by the South-Africa box fixture
  * (tests/test_enclaves.py: 65 = 5 level-4 + 60 level-5 sids).
  */
object Cover {

  private type V = Array[Double]
  @inline private def cross(a: V, b: V): V =
    Array(a(1) * b(2) - a(2) * b(1), a(2) * b(0) - a(0) * b(2), a(0) * b(1) - a(1) * b(0))
  @inline private def dot(a: V, b: V): Double = a(0) * b(0) + a(1) * b(1) + a(2) * b(2)
  @inline private def norm(a: V): V = {
    val n = math.sqrt(dot(a, a)); Array(a(0) / n, a(1) / n, a(2) / n)
  }
  @inline private def mid(a: V, b: V): V = norm(Array(a(0) + b(0), a(1) + b(1), a(2) + b(2)))

  /** A closed ring on the sphere, preprocessed for membership/crossing tests. */
  final class Ring(val pts: Array[V]) { // pts closed: first == last not required; treated cyclically
    val n: Int = pts.length
    val edgeNormals: Array[V] = Array.tabulate(n)(i => cross(pts(i), pts((i + 1) % n)))
    /** global spherical orientation: true = ccw (encloses the small side). */
    val ccw: Boolean = {
      val lats = pts.map(p => math.toDegrees(math.asin(math.max(-1.0, math.min(1.0, p(2))))))
      val lons = pts.map(p => math.toDegrees(math.atan2(p(1), p(0))))
      Geo.isCcw(lats, lons)
    }

    /** winding-number membership: is p in the region left of the edges? */
    def contains(p: V): Boolean = {
      // tangent basis at p
      val ref: V = if (math.abs(p(2)) < 0.9) Array(0.0, 0.0, 1.0) else Array(1.0, 0.0, 0.0)
      val e1 = norm(cross(ref, p))
      val e2 = cross(p, e1)
      var wind = 0.0
      var prev = 0.0
      var i = 0
      while (i <= n) {
        val v = pts(i % n)
        val az = math.atan2(dot(v, e2), dot(v, e1))
        if (i > 0) {
          var d = az - prev
          if (d > math.Pi) d -= 2 * math.Pi
          if (d < -math.Pi) d += 2 * math.Pi
          wind += d
        }
        prev = az
        i += 1
      }
      if (ccw) wind > math.Pi else wind > -math.Pi
    }

    /** does the great-circle arc (a,b) cross any ring edge? */
    def crossesArc(a: V, b: V): Boolean = {
      val nab = cross(a, b)
      var i = 0
      while (i < n) {
        val c = pts(i); val d = pts((i + 1) % n)
        val ncd = edgeNormals(i)
        val sc = dot(nab, c); val sd = dot(nab, d)
        if (sc * sd < 0) {
          val sa = dot(ncd, a); val sb = dot(ncd, b)
          if (sa * sb < 0) {
            // both great circles straddle; verify the crossing point lies on both short arcs
            val t0 = cross(nab, ncd)
            val t = if (dot(t0, Array(a(0) + b(0), a(1) + b(1), a(2) + b(2))) >= 0) t0
                    else Array(-t0(0), -t0(1), -t0(2))
            if (dot(t, Array(c(0) + d(0), c(1) + d(1), c(2) + d(2))) >= 0) return true
          }
        }
        i += 1
      }
      false
    }
  }

  sealed trait Region {
    def contains(p: V): Boolean
    /** conservative: does region boundary cross arc (a,b)? */
    def boundaryCrosses(a: V, b: V): Boolean
    /** any boundary vertex inside the spherical triangle? */
    def anchorInside(tri: Array[V]): Boolean
  }

  final class RingRegion(val ring: Ring) extends Region {
    def contains(p: V): Boolean = ring.contains(p)
    def boundaryCrosses(a: V, b: V): Boolean = ring.crossesArc(a, b)
    def anchorInside(tri: Array[V]): Boolean = {
      val n01 = cross(tri(0), tri(1)); val n12 = cross(tri(1), tri(2)); val n20 = cross(tri(2), tri(0))
      var i = 0
      while (i < ring.n) {
        val p = ring.pts(i)
        if (dot(n01, p) >= 0 && dot(n12, p) >= 0 && dot(n20, p) >= 0) return true
        i += 1
      }
      false
    }
  }

  /** spherical cap around unit center with angular radius (radians). */
  final class CapRegion(center: V, radius: Double) extends Region {
    private val cosR = math.cos(radius)
    def contains(p: V): Boolean = dot(center, p) >= cosR
    def boundaryCrosses(a: V, b: V): Boolean = {
      // min/max angle from center to arc (a,b): crossing iff min <= r <= max
      val da = dot(center, a); val db = dot(center, b)
      val maxDot = math.max(da, db)
      // closest point of great circle (a,b) to center
      val nab = norm(cross(a, b))
      val sinD = math.abs(dot(nab, center))
      val closestDot = math.sqrt(math.max(0.0, 1 - sinD * sinD))
      // check the closest point is within the arc segment
      val proj0 = Array(center(0) - dot(nab, center) * nab(0), center(1) - dot(nab, center) * nab(1), center(2) - dot(nab, center) * nab(2))
      val onArc = {
        val nrm = math.sqrt(dot(proj0, proj0))
        if (nrm < 1e-300) false
        else {
          val t = Array(proj0(0) / nrm, proj0(1) / nrm, proj0(2) / nrm)
          dot(cross(a, t), nab) >= 0 && dot(cross(t, b), nab) >= 0
        }
      }
      val hi = if (onArc) closestDot else maxDot
      val lo = math.min(da, db)
      lo <= cosR && cosR <= hi
    }
    def anchorInside(tri: Array[V]): Boolean = {
      val n01 = cross(tri(0), tri(1)); val n12 = cross(tri(1), tri(2)); val n20 = cross(tri(2), tri(0))
      dot(n01, center) >= 0 && dot(n12, center) >= 0 && dot(n20, center) >= 0
    }
  }

  /** Cover of the region, multi-res, ascending order (see class doc). */
  def cover(region: Region, level: Int): Array[Long] = {
    val out = new ArrayBuffer[Long]()
    var f = 0
    while (f < 8) {
      val fc = Htm.faces(f)
      descend(region, level, Array(Htm.verts(fc(0)), Htm.verts(fc(1)), Htm.verts(fc(2))),
        f.toLong, 0, out)
      f += 1
    }
    out.toArray
  }

  private def descend(region: Region, level: Int, tri: Array[V], loc: Long, depth: Int,
                      out: ArrayBuffer[Long]): Unit = {
    val c0 = region.contains(tri(0))
    val c1 = region.contains(tri(1))
    val c2 = region.contains(tri(2))
    val crosses = region.boundaryCrosses(tri(0), tri(1)) ||
      region.boundaryCrosses(tri(1), tri(2)) ||
      region.boundaryCrosses(tri(2), tri(0))
    val anchored = region.anchorInside(tri)
    if (!c0 && !c1 && !c2 && !crosses && !anchored) return // disjoint
    if (c0 && c1 && c2 && !crosses && !anchored) { // fully inside: emit at this depth
      out += ((loc << (5 + 2 * (Sid.MaxLevel - depth))) | depth)
      return
    }
    if (depth == level) { out += ((loc << (5 + 2 * (Sid.MaxLevel - depth))) | level); return }
    val w0 = mid(tri(1), tri(2)); val w1 = mid(tri(0), tri(2)); val w2 = mid(tri(0), tri(1))
    descend(region, level, Array(tri(0), w2, w1), (loc << 2) | 0, depth + 1, out)
    descend(region, level, Array(tri(1), w0, w2), (loc << 2) | 1, depth + 1, out)
    descend(region, level, Array(tri(2), w1, w0), (loc << 2) | 2, depth + 1, out)
    descend(region, level, Array(w0, w1, w2), (loc << 2) | 3, depth + 1, out)
  }

  /** Cover of a single ring given as lon/lat arrays (degrees), region =
    * left of directed edges. Mirrors sids_from_ring with force_ccw
    * handled by the caller. */
  def coverFromRing(lats: Array[Double], lons: Array[Double], level: Int): Array[Long] = {
    // drop the closing duplicate vertex if present
    val n0 = lats.length
    val n = if (n0 > 1 && lats(0) == lats(n0 - 1) && lons(0) == lons(n0 - 1)) n0 - 1 else n0
    val pts = Array.tabulate(n)(i => Htm.latLonToXyz(lats(i), lons(i)))
    cover(new RingRegion(new Ring(pts)), level)
  }

  /** Cover of a lat/lon-aligned box, inflated by `marginDeg` and with
    * edges densified every `stepDeg`, so the polygon's great-circle
    * edges track the box's constant-latitude edges: guarantees
    * cover ⊇ box (the exact-refine join plan: the STARE cover prunes,
    * the exact box predicate decides — no false negatives possible).
    * The box must not cross the antimeridian (split it first); latitudes
    * are clamped away from the poles after inflation, and whenever the
    * clamp engages (box reaches within marginDeg of 89.5°) a polar-cap
    * cover is unioned in so the superset guarantee holds all the way to
    * ±90° — without it, points above the clamped ring would be silently
    * lost by exact-refine joins. */
  def coverFromBox(lonMin: Double, lonMax: Double, latMin: Double, latMax: Double,
                   level: Int, marginDeg: Double = 2.0, stepDeg: Double = 4.0): Array[Long] = {
    val lo0 = lonMin - marginDeg; val lo1 = lonMax + marginDeg
    val la0 = math.max(-89.5, latMin - marginDeg); val la1 = math.min(89.5, latMax + marginDeg)
    // cap radius reaches marginDeg below the clamped ring latitude, so the
    // cap and the densified polygon overlap — no gap from great-circle sag
    val northCap: Array[Long] =
      if (latMax + marginDeg > 89.5)
        cover(new CapRegion(Array(0.0, 0.0, 1.0), math.toRadians(90.0 - 89.5 + marginDeg)), level)
      else Array.emptyLongArray
    val southCap: Array[Long] =
      if (latMin - marginDeg < -89.5)
        cover(new CapRegion(Array(0.0, 0.0, -1.0), math.toRadians(90.0 - 89.5 + marginDeg)), level)
      else Array.emptyLongArray
    val lons = new ArrayBuffer[Double](); val lats = new ArrayBuffer[Double]()
    def seg(fromLon: Double, toLon: Double, fromLat: Double, toLat: Double): Unit = {
      val span = math.max(math.abs(toLon - fromLon), math.abs(toLat - fromLat))
      val n = math.max(1, math.ceil(span / stepDeg).toInt)
      var i = 0
      while (i < n) {
        lons += fromLon + (toLon - fromLon) * i / n
        lats += fromLat + (toLat - fromLat) * i / n
        i += 1
      }
    }
    // ccw ring: south edge W->E, east S->N, north E->W, west N->S
    seg(lo0, lo1, la0, la0); seg(lo1, lo1, la0, la1)
    seg(lo1, lo0, la1, la1); seg(lo0, lo0, la1, la0)
    lons += lo0; lats += la0
    val box = coverFromPolygon(Array((lons.toArray, lats.toArray)), level, forceCcw = true)
    if (northCap.isEmpty && southCap.isEmpty) box
    else Sid.compress(box ++ northCap ++ southCap)
  }

  /** Elliptical cover (make_ellipse_sids, reference io/granules/modis.py
    * :525-598): the reference samples an ellipse boundary in a projected
    * CRS (matplotlib vertices), converts to lon/lat and covers the ring;
    * here the boundary is sampled directly in the local tangent plane at
    * the center — width/height are the FULL axis lengths in meters along
    * the rotated axes, `angleDeg` counterclockwise from east (the
    * reference passes angle = 90 - sensorAzimuth). Not meaningful at the
    * poles (east is undefined), like the projected-CRS original. */
  def ellipseCover(latDeg: Double, lonDeg: Double, widthM: Double, heightM: Double,
                   angleDeg: Double, level: Int, nSamples: Int = 64): Array[Long] = {
    val earthR = 6371008.8
    val c = Htm.latLonToXyz(latDeg, lonDeg)
    val east = norm(cross(Array(0.0, 0.0, 1.0), c))
    val north = cross(c, east)
    val ca = math.cos(math.toRadians(angleDeg)); val sa = math.sin(math.toRadians(angleDeg))
    val pts = Array.tabulate(nSamples) { t =>
      val phi = 2 * math.Pi * t / nSamples
      val x0 = (widthM / 2) * math.cos(phi); val y0 = (heightM / 2) * math.sin(phi)
      val x = x0 * ca - y0 * sa; val y = x0 * sa + y0 * ca
      val r = math.sqrt(x * x + y * y) / earthR // angular offset (radians)
      val cr = math.cos(r); val sr = math.sin(r)
      val ux = x / math.max(1e-300, math.sqrt(x * x + y * y))
      val uy = y / math.max(1e-300, math.sqrt(x * x + y * y))
      norm(Array(
        c(0) * cr + (east(0) * ux + north(0) * uy) * sr,
        c(1) * cr + (east(1) * ux + north(1) * uy) * sr,
        c(2) * cr + (east(2) * ux + north(2) * uy) * sr))
    }
    cover(new RingRegion(new Ring(pts)), level)
  }

  /** Circular cover: level-L trixels intersecting the cap of the given
    * diameter (degrees) centered on the sid's trixel center. Mirrors
    * pystare.sid2circular_cover (spatial_conversions.py:508-554). */
  def circularCover(sid: Long, diameterDeg: Double, level: Int): Array[Long] = {
    val (lat, lon) = Htm.sidToCenter(sid)
    val center = Htm.latLonToXyz(lat, lon)
    cover(new CapRegion(center, math.toRadians(diameterDeg / 2)), level)
  }

  /** Convex-hull cover (sids_from_ring convex=True /
    * pystare.cover_from_hull): cover of the spherical convex hull of the
    * ring points. Hull via tangent-plane projection at the vertex
    * centroid + Graham scan (rings are assumed to fit a hemisphere, true
    * for the reference's country fixtures). */
  def coverFromHull(lats: Array[Double], lons: Array[Double], level: Int): Array[Long] = {
    val n0 = lats.length
    val n = if (n0 > 1 && lats(0) == lats(n0 - 1) && lons(0) == lons(n0 - 1)) n0 - 1 else n0
    val pts = Array.tabulate(n)(i => Htm.latLonToXyz(lats(i), lons(i)))
    // tangent-plane coordinates at the centroid
    var cx = 0.0; var cy = 0.0; var cz = 0.0
    pts.foreach { p => cx += p(0); cy += p(1); cz += p(2) }
    val c = norm(Array(cx, cy, cz))
    val ref: V = if (math.abs(c(2)) < 0.9) Array(0.0, 0.0, 1.0) else Array(1.0, 0.0, 0.0)
    val e1 = norm(cross(ref, c))
    val e2 = cross(c, e1)
    val proj = pts.map(p => (dot(p, e1), dot(p, e2), p))
    // Graham scan (counter-clockwise hull)
    val sorted = proj.sortBy(t => (t._1, t._2))
    def turn(o: (Double, Double, V), a: (Double, Double, V), b: (Double, Double, V)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val hull = scala.collection.mutable.ArrayBuffer[(Double, Double, V)]()
    for (p <- sorted) {
      while (hull.length >= 2 && turn(hull(hull.length - 2), hull.last, p) <= 0) hull.remove(hull.length - 1)
      hull += p
    }
    val lower = hull.length + 1
    for (p <- sorted.reverseIterator) {
      while (hull.length >= lower && turn(hull(hull.length - 2), hull.last, p) <= 0) hull.remove(hull.length - 1)
      hull += p
    }
    hull.remove(hull.length - 1)
    val ring = new Ring(hull.map(_._3).toArray)
    cover(new RingRegion(ring), level)
  }

  /** Cover of a polygon with holes; exterior expected CCW, holes CW
    * (sids_from_polygon semantics: hole rings are covered as complements
    * and intersected, spatial_conversions.py:316-361). */
  def coverFromPolygon(rings: Array[(Array[Double], Array[Double])], level: Int,
                       forceCcw: Boolean): Array[Long] = {
    // shapely.orient step (planar): exterior ccw, holes cw
    var (extLons, extLats) = rings(0)
    if (forceCcw && Geo.planarSignedArea(extLons, extLats) < 0) {
      extLons = extLons.reverse; extLats = extLats.reverse
    }
    // spherical ccw enforcement (sids_from_ring force_ccw=True on exterior)
    if (forceCcw && !Geo.isCcw(extLats, extLons)) {
      extLons = extLons.reverse; extLats = extLats.reverse
    }
    val ext = coverFromRing(extLats, extLons, level)
    if (rings.length == 1) return ext
    val holeCovers = rings.tail.map { case (lons0, lats0) =>
      var lons = lons0; var lats = lats0
      if (forceCcw && Geo.planarSignedArea(lons, lats) > 0) { // holes forced cw (planar)
        lons = lons.reverse; lats = lats.reverse
      }
      coverFromRing(lats, lons, level)
    }
    holeCovers.foldLeft(ext)((acc, hc) => Sid.intersection(hc, acc))
  }
}

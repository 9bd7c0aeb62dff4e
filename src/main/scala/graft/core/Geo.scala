package graft.core

import scala.collection.mutable.ArrayBuffer

/** Spherical-geometry helpers: CCW orientation on the sphere, minimal WKT
  * parsing (no geometry library ships with this project), antimeridian
  * splitting of trixel polygons. */
object Geo {

  /** Spherical CCW test — same construction as the reference
    * (project_spherical_polygon + signed_area,
    * /root/reference/starepandas/tools/spatial_conversions.py:631-671):
    * project the ECEF vertices onto the tangent plane at the (vector)
    * centroid, with x-axis = centroid minus its x-component (normalized)
    * and y-axis = centroid × x-axis, then take the planar signed area.
    * Validated by the antimeridian/pole cases in tests/test_ccw.py. */
  def isCcw(lats: Array[Double], lons: Array[Double]): Boolean = {
    val n0 = lats.length
    // close ring if needed (reference vstacks first vertex)
    val closed = lats(0) == lats(n0 - 1) && lons(0) == lons(n0 - 1)
    val n = if (closed) n0 else n0 + 1
    val vs = Array.ofDim[Double](n, 3)
    var i = 0
    while (i < n0) {
      val v = Htm.latLonToXyz(lats(i), lons(i))
      vs(i)(0) = v(0); vs(i)(1) = v(1); vs(i)(2) = v(2)
      i += 1
    }
    if (!closed) { vs(n - 1)(0) = vs(0)(0); vs(n - 1)(1) = vs(0)(1); vs(n - 1)(2) = vs(0)(2) }
    // centroid (plain mean of the closed vertex list, like the reference)
    var cx = 0.0; var cy = 0.0; var cz = 0.0
    i = 0
    while (i < n) { cx += vs(i)(0); cy += vs(i)(1); cz += vs(i)(2); i += 1 }
    cx /= n; cy /= n; cz /= n
    val cn = math.sqrt(cx * cx + cy * cy + cz * cz)
    val nx = cx / cn; val ny = cy / cn; val nz = cz / cn
    // x-axis = normal - x̂(normal·x̂), normalized; y-axis = normal × x-axis
    var ax = 0.0; var ay = ny; var az = nz
    val an = math.sqrt(ax * ax + ay * ay + az * az)
    ax /= an; ay /= an; az /= an
    val bx = ny * az - nz * ay
    val by = nz * ax - nx * az
    val bz = nx * ay - ny * ax
    // project to the tangent plane, then planar shoelace over the closed ring
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    i = 0
    while (i < n) {
      val d = vs(i)(0) * nx + vs(i)(1) * ny + vs(i)(2) * nz
      val qx = vs(i)(0) - d * nx; val qy = vs(i)(1) - d * ny; val qz = vs(i)(2) - d * nz
      xs(i) = qx * ax + qy * ay + qz * az
      ys(i) = qx * bx + qy * by + qz * bz
      i += 1
    }
    var area = 0.0
    i = 0
    while (i < n) {
      val p = (i + n - 1) % n // cross(roll(v,1), v) pairs, as in the reference
      area += xs(p) * ys(i) - ys(p) * xs(i)
      i += 1
    }
    0.5 * area > 0.0
  }

  // ----------------------------------------------------------------- WKT

  sealed trait Geom
  final case class PointG(lon: Double, lat: Double) extends Geom
  /** rings: first = exterior, rest = holes; each ring is (lons, lats), closed. */
  final case class PolygonG(rings: Array[(Array[Double], Array[Double])]) extends Geom
  final case class MultiPolygonG(polys: Array[PolygonG]) extends Geom

  /** Parse POINT / POLYGON / MULTIPOLYGON WKT (lon lat order). */
  def parseWkt(wkt: String): Geom = {
    val s = wkt.trim
    val u = s.toUpperCase
    if (u.startsWith("POINT")) {
      val inner = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')')).trim
      val parts = inner.split("\\s+")
      PointG(parts(0).toDouble, parts(1).toDouble)
    } else if (u.startsWith("MULTIPOLYGON")) {
      val inner = s.substring(s.indexOf('('), s.lastIndexOf(')') + 1)
      MultiPolygonG(parsePolyList(inner))
    } else if (u.startsWith("POLYGON")) {
      val inner = s.substring(s.indexOf('('), s.lastIndexOf(')') + 1)
      PolygonG(parseRingList(inner))
    } else sys.error(s"unsupported WKT: ${s.take(40)}")
  }

  /** inner = "(((...)),((...)))" */
  private def parsePolyList(inner: String): Array[PolygonG] = {
    val out = new ArrayBuffer[PolygonG]()
    var depth = 0; var start = -1
    var i = 1 // skip outer '('
    while (i < inner.length - 1) {
      val c = inner.charAt(i)
      if (c == '(') { if (depth == 0) start = i; depth += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth == 0) out += PolygonG(parseRingList(inner.substring(start, i + 1)))
      }
      i += 1
    }
    out.toArray
  }

  /** inner = "((x y, x y, ...),(hole...))" */
  private def parseRingList(inner: String): Array[(Array[Double], Array[Double])] = {
    val out = new ArrayBuffer[(Array[Double], Array[Double])]()
    var depth = 0; var start = -1
    var i = 1
    while (i < inner.length - 1) {
      val c = inner.charAt(i)
      if (c == '(') { if (depth == 0) start = i + 1; depth += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth == 0) {
          val coords = inner.substring(start, i).split(",")
          val lons = new Array[Double](coords.length)
          val lats = new Array[Double](coords.length)
          var j = 0
          while (j < coords.length) {
            val p = coords(j).trim.split("\\s+")
            lons(j) = p(0).toDouble; lats(j) = p(1).toDouble
            j += 1
          }
          out += ((lons, lats))
        }
      }
      i += 1
    }
    out.toArray
  }

  /** Planar signed area (shoelace, lon/lat plane) — used to replicate
    * shapely.geometry.polygon.orient's planar orientation step. */
  def planarSignedArea(lons: Array[Double], lats: Array[Double]): Double = {
    var a = 0.0
    var i = 0
    val n = lons.length
    while (i < n) {
      val j = (i + 1) % n
      a += lons(i) * lats(j) - lons(j) * lats(i)
      i += 1
    }
    a / 2
  }

  private final val PoleLatEps = 1e-7

  /** Does the great-circle edge between two ring vertices cross the
    * antimeridian? The edge sweeps the SHORT longitude way between its
    * endpoints, which wraps through +/-180 exactly when the raw delta
    * exceeds 180. Edges to/from a pole vertex are meridians and never
    * cross (a pole vertex's longitude is a numerical artifact — atan2 of
    * a zero vector — so a delta against it is meaningless; the round-2
    * `max(lon)-min(lon) > 180` trigger misfired on exactly those). */
  private def edgeCrosses(lon1: Double, lat1: Double,
                          lon2: Double, lat2: Double): Boolean =
    math.abs(lat1) < 90 - PoleLatEps && math.abs(lat2) < 90 - PoleLatEps &&
      math.abs(lon2 - lon1) > 180

  /** Split polygons straddling the antimeridian: same semantics as the
    * reference (trixel_conversions.py:598-649), which wraps the crossing
    * ring's vertices, intersects with the [-180,180] bbox (inside part)
    * and translates the remainder by -360 before re-unioning. Trixel
    * rings are convex, so the bbox intersection/difference each yield
    * exactly one piece — equivalent to clipping the shifted ring at the
    * 180 meridian, which is what this does: emit 1..2 rings with all
    * lons in [-180, 180]. `drop=true` mirrors the reference's option of
    * dropping seam-crossing trixels instead of splitting them.
    *
    * Splitting triggers on an ACTUAL seam crossing of some edge (see
    * edgeCrosses), not on total lon span: a polar trixel legitimately
    * spans wide longitudes without crossing. When a crossing ring has a
    * pole vertex, that vertex is first expanded into two pole-latitude
    * points carrying its neighbours' longitudes, so the planar clip sees
    * the true meridian edges instead of a spurious sweep through the
    * artifact longitude. */
  def splitAntimeridian(lons: Array[Double], lats: Array[Double],
                        drop: Boolean = false): Array[(Array[Double], Array[Double])] = {
    val n0 = lons.length
    val crossing = (0 until n0).exists { i =>
      val j = (i + 1) % n0
      edgeCrosses(lons(i), lats(i), lons(j), lats(j))
    }
    if (!crossing) return Array((lons, lats))
    if (drop) return Array.empty
    // pole-vertex expansion (only needed on the split path)
    val (exLons, exLats) = {
      if (!lats.exists(la => math.abs(la) >= 90 - PoleLatEps)) (lons, lats)
      else {
        val ls = new ArrayBuffer[Double](); val as = new ArrayBuffer[Double]()
        var i = 0
        while (i < n0) {
          if (math.abs(lats(i)) >= 90 - PoleLatEps) {
            val prev = (i + n0 - 1) % n0; val next = (i + 1) % n0
            ls += lons(prev); as += lats(i)
            ls += lons(next); as += lats(i)
          } else { ls += lons(i); as += lats(i) }
          i += 1
        }
        (ls.toArray, as.toArray)
      }
    }
    val lats2 = exLats
    // shift negative lons +360, clip at 180, producing east part and west part
    val shifted = exLons.map(l => if (l < 0) l + 360 else l)
    def clip(lo: Double, hi: Double): (Array[Double], Array[Double]) = {
      val xs = new ArrayBuffer[Double](); val ys = new ArrayBuffer[Double]()
      val n = shifted.length
      var i = 0
      while (i < n) {
        val j = (i + 1) % n
        val x1 = shifted(i); val y1 = lats2(i); val x2 = shifted(j); val y2 = lats2(j)
        val in1 = x1 >= lo && x1 <= hi; val in2 = x2 >= lo && x2 <= hi
        if (in1) { xs += x1; ys += y1 }
        if (in1 != in2) {
          val b = if (x2 > hi || x1 > hi) hi else lo
          val t = (b - x1) / (x2 - x1)
          xs += b; ys += y1 + t * (y2 - y1)
        }
        i += 1
      }
      (xs.toArray, ys.toArray)
    }
    val east = clip(0, 180)
    val west0 = clip(180, 360)
    val west = (west0._1.map(l => l - 360), west0._2)
    Array(east, west).filter(_._1.length >= 3)
  }

  /** Signed spherical area (unit sphere) of a simple geodesic-edged ring
    * via Gauss–Bonnet: area = 2π − Σ exterior turning angles. A CCW ring
    * (interior left, viewed from outside) yields the area of its
    * enclosed region in (0, 4π); a CW ring yields 4π minus the enclosed
    * area (the left region is the complement) — so a polygon with holes
    * is `ringArea(shell) + Σ(ringArea(hole) − 4π)`. Rings may be open or
    * closed (first == last). */
  def sphericalRingArea(lats: Array[Double], lons: Array[Double]): Double = {
    val closed = lats.length > 1 && lats(0) == lats(lats.length - 1) &&
      lons(0) == lons(lons.length - 1)
    val n = if (closed) lats.length - 1 else lats.length
    require(n >= 3, s"ring needs >=3 distinct vertices, got $n")
    val vs = Array.tabulate(n)(i => Htm.latLonToXyz(lats(i), lons(i)))
    @inline def tangent(from: Array[Double], to: Array[Double]): Array[Double] = {
      val d = to(0) * from(0) + to(1) * from(1) + to(2) * from(2)
      val x = to(0) - d * from(0); val y = to(1) - d * from(1); val z = to(2) - d * from(2)
      val m = math.sqrt(x * x + y * y + z * z)
      Array(x / m, y / m, z / m)
    }
    var turning = 0.0
    var i = 0
    while (i < n) {
      val a = vs((i + n - 1) % n); val b = vs(i); val c = vs((i + 1) % n)
      val tIn = tangent(b, a) // points back toward a; arrival direction = -tIn
      val tOut = tangent(b, c)
      val cx = -(tIn(1) * tOut(2) - tIn(2) * tOut(1))
      val cy = -(tIn(2) * tOut(0) - tIn(0) * tOut(2))
      val cz = -(tIn(0) * tOut(1) - tIn(1) * tOut(0))
      val cross = cx * b(0) + cy * b(1) + cz * b(2)
      val d = -(tIn(0) * tOut(0) + tIn(1) * tOut(1) + tIn(2) * tOut(2))
      turning += math.atan2(cross, d)
      i += 1
    }
    val area = 2 * math.Pi - turning
    // map into [0, 4π): a CW ring's raw value can exceed 4π by fp noise
    if (area < 0) area + 4 * math.Pi else if (area >= 4 * math.Pi) area - 4 * math.Pi else area
  }

  /** Total spherical area of a parsed (multi)polygon WKT: shells add,
    * holes subtract (see `sphericalRingArea` sign convention). */
  def sphericalWktArea(wkt: String): Double = {
    val polys = parseWkt(wkt) match {
      case MultiPolygonG(ps) => ps
      case p: PolygonG => Array(p)
      case g => sys.error(s"not a polygon: $g")
    }
    polys.map { p =>
      val shell = sphericalRingArea(p.rings(0)._2, p.rings(0)._1)
      val holes = p.rings.drop(1)
        .map(r => 4 * math.Pi - sphericalRingArea(r._2, r._1)).sum
      shell - holes
    }.sum
  }
}

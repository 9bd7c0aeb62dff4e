package graft.core

/** Hierarchical Triangular Mesh geometry behind STARE SIDs — from-scratch
  * implementation (the reference delegates to the C++-backed pystare;
  * see /root/reference/starepandas/tools/spatial_conversions.py:113-138).
  *
  * Grid definition (reverse-engineered from constants frozen in the
  * reference docstrings/tests and calibrated bit-for-bit against the
  * golden SIDs in FIXTURES.md §2):
  *
  *   - Base solid: the classic HTM octahedron with vertices
  *     (0,0,1),(1,0,0),(0,1,0),(-1,0,0),(0,-1,0),(0,0,-1), rotated about
  *     axis (1,1,0)/√2 by θ = π/4 − 1.2e-8 rad. The −1.2e-8 offset was
  *     solved from the full-precision trixel centers frozen at
  *     trixel_conversions.py:137 and :231 (residual ~1e-14) and verified
  *     against all six golden lat/lon→SID encodes.
  *   - Faces 0..7 = classic HTM S0..S3,N0..N3 with vertex tables
  *     S0=(1,5,2) S1=(2,5,3) S2=(3,5,4) S3=(4,5,1)
  *     N0=(1,0,4) N1=(4,0,3) N2=(3,0,2) N3=(2,0,1).
  *   - Children of (v0,v1,v2) with normalized edge midpoints w0=m(v1,v2),
  *     w1=m(v0,v2), w2=m(v0,v1): c0=(v0,w2,w1), c1=(v1,w0,w2),
  *     c2=(v2,w1,w0), c3=(w0,w1,w2).
  *   - Point location: strict half-space tests (reject when
  *     cross(a,b)·p < 0, no epsilon), children tried in order 0,1,2 and
  *     3 as the fallback. The descent always runs the full 27 levels;
  *     the requested level only stamps the low 5 bits (verified: level-27
  *     and level-20 encodes of one point share all location bits,
  *     spatial_conversions.py:216-221,261-266).
  */
object Htm {
  final val RotationDelta = -1.2e-8

  /** octahedron vertices after rotation; (x,y,z) triples. */
  val verts: Array[Array[Double]] = {
    val axis = {
      val n = math.sqrt(2.0)
      Array(1.0 / n, 1.0 / n, 0.0)
    }
    val theta = math.Pi / 4 + RotationDelta
    val c = math.cos(theta); val s = math.sin(theta)
    val base = Array(
      Array(0.0, 0.0, 1.0), Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0),
      Array(-1.0, 0.0, 0.0), Array(0.0, -1.0, 0.0), Array(0.0, 0.0, -1.0))
    base.map { v =>
      val d = axis(0) * v(0) + axis(1) * v(1) + axis(2) * v(2)
      val cr = Array(
        axis(1) * v(2) - axis(2) * v(1),
        axis(2) * v(0) - axis(0) * v(2),
        axis(0) * v(1) - axis(1) * v(0))
      Array(
        v(0) * c + cr(0) * s + axis(0) * d * (1 - c),
        v(1) * c + cr(1) * s + axis(1) * d * (1 - c),
        v(2) * c + cr(2) * s + axis(2) * d * (1 - c))
    }
  }

  /** face index -> (i0, i1, i2) into verts; classic HTM order. */
  val faces: Array[Array[Int]] = Array(
    Array(1, 5, 2), Array(2, 5, 3), Array(3, 5, 4), Array(4, 5, 1),
    Array(1, 0, 4), Array(4, 0, 3), Array(3, 0, 2), Array(2, 0, 1))

  @inline private def cross(a: Array[Double], b: Array[Double]): Array[Double] =
    Array(a(1) * b(2) - a(2) * b(1), a(2) * b(0) - a(0) * b(2), a(0) * b(1) - a(1) * b(0))
  @inline private def dot(a: Array[Double], b: Array[Double]): Double =
    a(0) * b(0) + a(1) * b(1) + a(2) * b(2)
  @inline private def mid(a: Array[Double], b: Array[Double]): Array[Double] = {
    val x = a(0) + b(0); val y = a(1) + b(1); val z = a(2) + b(2)
    val n = math.sqrt(x * x + y * y + z * z)
    Array(x / n, y / n, z / n)
  }

  @inline private def insideStrict(p: Array[Double], v0: Array[Double], v1: Array[Double], v2: Array[Double]): Boolean =
    dot(cross(v0, v1), p) >= 0 && dot(cross(v1, v2), p) >= 0 && dot(cross(v2, v0), p) >= 0

  def latLonToXyz(lat: Double, lon: Double): Array[Double] = {
    val la = math.toRadians(lat); val lo = math.toRadians(lon)
    Array(math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo), math.sin(la))
  }

  def xyzToLatLon(v: Array[Double]): (Double, Double) = {
    val n = math.sqrt(dot(v, v))
    (math.toDegrees(math.asin(v(2) / n)), math.toDegrees(math.atan2(v(1), v(0))))
  }

  /** lat/lon (degrees) -> SID at the given level (0..27). */
  def latLonToSid(lat: Double, lon: Double, level: Int): Long = {
    val p = latLonToXyz(lat, lon)
    xyzToSid(p, level)
  }

  def xyzToSid(p: Array[Double], level: Int): Long = {
    var face = 0
    var v0: Array[Double] = null; var v1: Array[Double] = null; var v2: Array[Double] = null
    var f = 0
    var found = false
    while (f < 8 && !found) {
      val fc = faces(f)
      val a = verts(fc(0)); val b = verts(fc(1)); val c = verts(fc(2))
      if (insideStrict(p, a, b, c)) { face = f; v0 = a; v1 = b; v2 = c; found = true }
      f += 1
    }
    if (!found) { // numerically outside all faces (can only happen on exact seams) — take face 7
      face = 7
      val fc = faces(7); v0 = verts(fc(0)); v1 = verts(fc(1)); v2 = verts(fc(2))
    }
    var loc: Long = face.toLong
    var lev = 0
    while (lev < Sid.MaxLevel) {
      val w0 = mid(v1, v2); val w1 = mid(v0, v2); val w2 = mid(v0, v1)
      var child = 3
      if (insideStrict(p, v0, w2, w1)) { child = 0; v1 = w2; v2 = w1 }
      else if (insideStrict(p, v1, w0, w2)) { child = 1; v0 = v1; v1 = w0; v2 = w2 }
      else if (insideStrict(p, v2, w1, w0)) { child = 2; v0 = v2; v1 = w1; v2 = w0 }
      else { v0 = w0; v1 = w1; v2 = w2 }
      loc = (loc << 2) | child
      lev += 1
    }
    (loc << 5) | level
  }

  /** Corner vertices (unit xyz) of a sid's trixel, at its own level. */
  def sidToTriangle(sid: Long): Array[Array[Double]] = {
    val loc = sid >>> 5
    val level = Sid.level(sid)
    val face = ((loc >> 54) & 7L).toInt
    val fc = faces(face)
    var v0 = verts(fc(0)); var v1 = verts(fc(1)); var v2 = verts(fc(2))
    var lev = 0
    while (lev < level) {
      val c = ((loc >> (52 - 2 * lev)) & 3L).toInt
      val w0 = mid(v1, v2); val w1 = mid(v0, v2); val w2 = mid(v0, v1)
      c match {
        case 0 => v1 = w2; v2 = w1
        case 1 => v0 = v1; v1 = w0; v2 = w2
        case 2 => v0 = v2; v1 = w1; v2 = w0
        case _ => v0 = w0; v1 = w1; v2 = w2
      }
      lev += 1
    }
    Array(v0, v1, v2)
  }

  /** Trixel corner + center lat/lons, antimeridian-wrapped like
    * trixel_conversions.py:49-54 (lon>180 -> lon-360). Returns
    * (cornerLats, cornerLons, centerLat, centerLon). */
  def sidToVertices(sid: Long, wrapLon: Boolean = true): (Array[Double], Array[Double], Double, Double) = {
    val t = sidToTriangle(sid)
    val lats = new Array[Double](3)
    val lons = new Array[Double](3)
    var i = 0
    while (i < 3) {
      val (la, lo) = xyzToLatLon(t(i))
      lats(i) = la
      lons(i) = if (wrapLon && lo > 180) ((lo + 180) % 360) - 180 else lo
      i += 1
    }
    val ctr = Array(t(0)(0) + t(1)(0) + t(2)(0), t(0)(1) + t(1)(1) + t(2)(1), t(0)(2) + t(1)(2) + t(2)(2))
    val (cla, cloRaw) = xyzToLatLon(ctr)
    val clo = if (wrapLon && cloRaw > 180) ((cloRaw + 180) % 360) - 180 else cloRaw
    (lats, lons, cla, clo)
  }

  def sidToCenter(sid: Long): (Double, Double) = {
    val v = sidToVertices(sid)
    (v._3, v._4)
  }

  /** Solid angle of the trixel (steradians) × r² — spherical excess.
    * Mirrors trixel_area (staredataframe.py:915-929). */
  def area(sid: Long, r: Double = 1.0): Double = {
    val t = sidToTriangle(sid)
    // spherical excess via L'Huilier
    def angDist(a: Array[Double], b: Array[Double]): Double = {
      val d = dot(a, b)
      math.acos(math.max(-1.0, math.min(1.0, d)))
    }
    val a = angDist(t(1), t(2)); val b = angDist(t(0), t(2)); val c = angDist(t(0), t(1))
    val s = (a + b + c) / 2
    val t4 = math.tan(s / 2) * math.tan((s - a) / 2) * math.tan((s - b) / 2) * math.tan((s - c) / 2)
    4 * math.atan(math.sqrt(math.max(0.0, t4))) * r * r
  }
}

package graft.core

import scala.collection.mutable

/** Exact geometry union of a trixel set → WKT MULTIPOLYGON, closing the
  * reference's `dissolve(geom=True)` (staredataframe.py:884-886, which
  * delegates the union to geopandas/shapely) WITHOUT a geometry library,
  * by exploiting trixel structure:
  *
  * 1. expand all sids to one uniform level — adjacent trixels then share
  *    whole edges, and shared vertices are BIT-IDENTICAL doubles: every
  *    subdivision midpoint is computed as normalize(a+b) from the same
  *    two endpoint vectors regardless of which triangle derives it
  *    (fp addition is commutative), inductively down from the shared
  *    root octahedron vertices;
  * 2. emit each triangle's 3 directed edges (consistent orientation —
  *    HTM child tuples preserve parent orientation, medial triangle
  *    included) and cancel opposite-direction pairs: interior edges
  *    vanish, the surviving directed edges are exactly the region
  *    boundary with interior-on-the-left orientation;
  * 3. union-find triangles over shared edges → connected components
  *    (vertex-touching regions stay separate polygons, as in shapely);
  * 4. stitch each component's boundary edges into closed rings; the
  *    spherically-CCW ring is the shell, CW rings are holes.
  *
  * Exactness: no tolerance, no snapping — cancellation is bitwise, so
  * the output boundary vertices are exactly the trixel corner grid.
  * Collinear sub-edges along a coarser straight boundary ARE merged:
  * subdivision only ever puts a boundary vertex on a straight arc as
  * the exact normalized midpoint of its neighbors, so vertices with
  * v == mid(prev, next) (bitwise) are removed to a fixpoint — the 4
  * children of a trixel dissolve to exactly its 3-corner ring.
  * Caveat (documented): ring orientation is judged from the ring's own
  * centroid, so a single ring enclosing more than a hemisphere would
  * misclassify — covers are regional; out of scope like the reference.
  */
object TrixelUnion {

  /** Cap on triangles after single-level expansion: a pathological level
    * spread (level-0 next to level-12) multiplies 4^12; fail loudly
    * rather than OOM an executor. */
  val MaxTriangles: Int = 1 << 20

  @inline private def pack(a: Int, b: Int): Long = (a.toLong << 32) | (b.toLong & 0xffffffffL)

  def dissolveWkt(sidsIn: Array[Long]): String = {
    require(sidsIn.nonEmpty, "dissolveWkt: empty sid set")
    // uniform level; dedup kills duplicates AND nested finer cells
    // (their expansion collides with the coarser cell's)
    val maxLvl = { var m = 0; sidsIn.foreach(s => m = math.max(m, Sid.level(s))); m }
    var est = 0L
    sidsIn.foreach { s => est += (1L << (2 * (maxLvl - Sid.level(s)))); }
    require(est <= MaxTriangles,
      s"dissolve would expand to $est triangles (cap $MaxTriangles): level spread too wide")
    val cells = Sid.expandToLevel(sidsIn, maxLvl).distinct

    // intern vertices by exact bits; union-find over CELLS via shared edges
    val vIdx = new mutable.HashMap[(Long, Long, Long), Int]
    val vXyz = new mutable.ArrayBuffer[Array[Double]]
    def vid(v: Array[Double]): Int = {
      val k = (java.lang.Double.doubleToLongBits(v(0)),
        java.lang.Double.doubleToLongBits(v(1)), java.lang.Double.doubleToLongBits(v(2)))
      vIdx.getOrElseUpdate(k, { vXyz += v; vXyz.length - 1 })
    }
    val cellParent = Array.tabulate(cells.length)(identity)
    def find(i: Int): Int = {
      var r = i; while (cellParent(r) != r) r = cellParent(r)
      var c = i; while (cellParent(c) != r) { val n = cellParent(c); cellParent(c) = r; c = n }
      r
    }
    def union(i: Int, j: Int): Unit = { val ri = find(i); val rj = find(j); if (ri != rj) cellParent(ri) = rj }

    // boundary: packed directed edge -> owning cell index; inserting an
    // edge whose reverse is present cancels both (interior edge)
    val boundary = new java.util.HashMap[java.lang.Long, Integer](cells.length * 2)
    var ci = 0
    while (ci < cells.length) {
      val t = Htm.sidToTriangle(cells(ci))
      val a = vid(t(0)); val b = vid(t(1)); val c = vid(t(2))
      var k = 0
      val ids = Array(a, b, c)
      while (k < 3) {
        val u = ids(k); val w = ids((k + 1) % 3)
        val rev = boundary.remove(pack(w, u): java.lang.Long)
        if (rev != null) union(ci, rev.intValue())
        else {
          val prev = boundary.put(pack(u, w): java.lang.Long, ci)
          require(prev == null, "non-manifold edge: inconsistent trixel orientation or overlap")
        }
        k += 1
      }
      ci += 1
    }

    // stitch rings per component (start-vertex -> edges, component-local
    // so vertex-pinched components never cross-walk)
    val byComp = new mutable.HashMap[Int, mutable.HashMap[Int, mutable.ArrayDeque[Int]]]
    boundary.forEach { (e, cell) =>
      val a = (e.longValue() >> 32).toInt; val b = e.longValue().toInt
      byComp.getOrElseUpdate(find(cell), new mutable.HashMap)
        .getOrElseUpdate(a, new mutable.ArrayDeque).append(b)
    }

    // drop vertices sitting exactly mid-arc between their neighbors
    // (bitwise test against Htm's own midpoint formula — the only way
    // subdivision places a vertex on a straight boundary run)
    def isMid(u: Int, v: Int, w: Int): Boolean = {
      val a = vXyz(u); val b = vXyz(w); val m = vXyz(v)
      val x = a(0) + b(0); val y = a(1) + b(1); val z = a(2) + b(2)
      val n = math.sqrt(x * x + y * y + z * z)
      java.lang.Double.doubleToLongBits(x / n) == java.lang.Double.doubleToLongBits(m(0)) &&
        java.lang.Double.doubleToLongBits(y / n) == java.lang.Double.doubleToLongBits(m(1)) &&
        java.lang.Double.doubleToLongBits(z / n) == java.lang.Double.doubleToLongBits(m(2))
    }
    // one pass removes non-adjacent mid vertices (adjacent removals could
    // strand a quarter-point relative to its new neighbors); passes repeat
    // to a fixpoint, which dyadic subdivision reaches in ≤ level passes
    def simplify(ring: Seq[Int]): Seq[Int] = {
      var cur = ring.toIndexedSeq
      var changed = true
      while (changed && cur.length > 3) {
        changed = false
        val n = cur.length
        val removed = new Array[Boolean](n)
        var live = n
        var i = 0
        while (i < n && live > 3) {
          val prevIdx = (i + n - 1) % n
          val nextIdx = (i + 1) % n
          if (!removed(prevIdx) && !removed(nextIdx) &&
              isMid(cur(prevIdx), cur(i), cur(nextIdx))) {
            removed(i) = true; live -= 1; changed = true
          }
          i += 1
        }
        cur = cur.indices.collect { case j if !removed(j) => cur(j) }
      }
      cur
    }

    def ringLatLon(ring: Seq[Int]): (Array[Double], Array[Double]) = {
      val lats = new Array[Double](ring.length)
      val lons = new Array[Double](ring.length)
      var i = 0
      ring.foreach { v =>
        val (la, lo) = Htm.xyzToLatLon(vXyz(v))
        lats(i) = la
        lons(i) = if (lo > 180) ((lo + 180) % 360) - 180 else lo
        i += 1
      }
      (lats, lons)
    }

    val polys = byComp.valuesIterator.map { out =>
      val rings = new mutable.ArrayBuffer[Seq[Int]]
      while (out.nonEmpty) {
        val start = out.keysIterator.next()
        val ring = new mutable.ArrayBuffer[Int]
        var cur = start
        do {
          ring += cur
          val nexts = out(cur)
          cur = nexts.removeHead()
          if (nexts.isEmpty) out.remove(ring.last)
        } while (cur != start)
        rings += simplify(ring.toSeq)
      }
      val (shells, holes) = rings.partition { r =>
        val (lats, lons) = ringLatLon(r); Geo.isCcw(lats, lons)
      }
      require(shells.length == 1,
        s"component stitched to ${shells.length} shells (expected 1)")
      (shells.head, holes.toSeq)
    }.toSeq

    def ringWkt(r: Seq[Int]): String = {
      val (lats, lons) = ringLatLon(r)
      val pts = (r.indices :+ 0).map(i => s"${lons(i)} ${lats(i)}").mkString(", ")
      s"($pts)"
    }
    polys.map { case (shell, holes) =>
      (ringWkt(shell) +: holes.map(ringWkt)).mkString("(", ", ", ")")
    }.mkString("MULTIPOLYGON (", ", ", ")")
  }
}

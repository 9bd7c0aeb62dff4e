package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Cover, Geo, Htm, Sid, TrixelUnion}

/** dissolve(geom=True) kernel: exact union of trixel sets by edge
  * cancellation (core.TrixelUnion). The closed-form fixtures exploit
  * HTM subdivision structure: the 4 children of any trixel tile it
  * exactly, the 3 corner children leave the center child as a hole,
  * and corner children 0/1 touch only at a vertex (two components). */
class TrixelUnionSpec extends AnyFunSuite {

  private def child(sid: Long, i: Int): Long = Sid.child(sid, i)

  // compare vertex sets on a wrapped, 1e-9-deg-rounded key: seam-crossing
  // polygons are emitted with lons shifted to [0,360) (±1 ulp of +360),
  // so raw bit equality would fail across the representation change
  private def key(lon: Double, lat: Double): (Long, Long) = {
    val l = if (lon > 180) lon - 360 else lon
    (math.rint(l * 1e9).toLong, math.rint(lat * 1e9).toLong)
  }

  private def ringSet(ring: (Array[Double], Array[Double])): Set[(Long, Long)] =
    ring._1.zip(ring._2).map { case (lo, la) => key(lo, la) }.toSet

  private def cornersSet(sid: Long): Set[(Long, Long)] = {
    val (lats, lons, _, _) = Htm.sidToVertices(sid)
    lons.zip(lats).map { case (lo, la) => key(lo, la) }.toSet
  }

  private def polys(wkt: String): Array[Geo.PolygonG] =
    Geo.parseWkt(wkt).asInstanceOf[Geo.MultiPolygonG].polys

  private def randSids: Seq[Long] = {
    val r = new scala.util.Random(7)
    (1 to 40).map { _ =>
      val lat = r.nextDouble() * 170 - 85
      val lon = r.nextDouble() * 360 - 180
      Htm.latLonToSid(lat, lon, 1 + r.nextInt(9))
    }
  }

  test("4 children dissolve to exactly the parent triangle (every face, random cells, all levels)") {
    val cases = (0 until 8).map(f => (f.toLong << 59) | 0L) ++ randSids
    cases.foreach { parent =>
      val wkt = TrixelUnion.dissolveWkt(Array.tabulate(4)(child(parent, _)))
      val ps = polys(wkt)
      assert(ps.length === 1, s"parent $parent")
      assert(ps(0).rings.length === 1)
      // closed ring of the 3 parent corners, bit-exact
      assert(ps(0).rings(0)._1.length === 4)
      assert(ringSet(ps(0).rings(0)) === cornersSet(parent))
    }
  }

  test("annulus (16 grandchildren minus center-of-center) dissolves to parent shell + exact hole") {
    (randSids ++ Seq((3L << 59) | 0L)).foreach { parent =>
      val missing = child(child(parent, 3), 3)
      val cells = (for (i <- 0 until 4; j <- 0 until 4) yield child(child(parent, i), j))
        .filterNot(_ == missing).toArray
      val ps = polys(TrixelUnion.dissolveWkt(cells))
      assert(ps.length === 1)
      assert(ps(0).rings.length === 2, s"parent $parent: expected shell+hole")
      val shell = ps(0).rings(0); val hole = ps(0).rings(1)
      // shell: exactly the parent triangle (edge midpoints simplified away)
      assert(shell._1.length === 4)
      assert(ringSet(shell) === cornersSet(parent))
      // hole ring == the missing cell's corners, bit-exact, CW (shell CCW)
      assert(ringSet(hole) === cornersSet(missing))
      assert(Geo.isCcw(shell._2, shell._1))
      assert(!Geo.isCcw(hole._2, hole._1))
    }
  }

  test("pinch regression: a hole touching the shell at a vertex stays a separate ring") {
    // removing a CORNER grandchild of the center child leaves a hole one
    // of whose vertices lies ON the outer shell — at that degree-2
    // branch vertex the edge walk must pair continuations by rotation,
    // not hash order (the old vertex-based walk spliced shell and hole
    // into one self-touching 8-vertex ring for i=0 on some hash orders)
    for (parent <- randSids.take(12); i <- 0 until 3) {
      val missing = child(child(parent, 3), i)
      val cells = (for (a <- 0 until 4; b <- 0 until 4) yield child(child(parent, a), b))
        .filterNot(_ == missing).toArray
      val ps = polys(TrixelUnion.dissolveWkt(cells))
      assert(ps.length === 1, s"parent $parent missing child $i")
      assert(ps(0).rings.length === 2, s"parent $parent missing child $i: expected shell+hole")
      assert(ringSet(ps(0).rings(0)) === cornersSet(parent))
      assert(ringSet(ps(0).rings(1)) === cornersSet(missing))
    }
  }

  test("antimeridian: seam-crossing dissolve emits planar-readable lons (no >180 jumps)") {
    val seamCell = Sid.intervalLo(Htm.latLonToSid(10, 179.9, 6)) | 6L
    val wkt = TrixelUnion.dissolveWkt(Array.tabulate(4)(child(seamCell, _)))
    val ps = polys(wkt)
    assert(ps.length === 1)
    val lons = ps(0).rings(0)._1
    lons.indices.foreach { i =>
      assert(math.abs(lons((i + 1) % lons.length) - lons(i)) <= 180,
        s"seam jump in $wkt")
    }
    // and a far-from-seam dissolve keeps plain (-180,180] lons
    val mid = Sid.intervalLo(Htm.latLonToSid(10, 5, 6)) | 6L
    val lons2 = polys(TrixelUnion.dissolveWkt(Array.tabulate(4)(child(mid, _)))).head.rings(0)._1
    assert(lons2.forall(lo => lo >= -180 && lo <= 180))
  }

  test("cap estimate is computed after dedup (repeated coarse cells do not trip it)") {
    val parent = Sid.intervalLo(Htm.latLonToSid(10, 10, 5)) | 5L
    val repeated = Array.fill(5000)(child(parent, 0)) ++ Array.tabulate(4)(child(parent, _)) ++
      Array(Htm.latLonToSid(10.001, 10.001, 10)) // level spread 5..10, est well under cap
    val ps = polys(TrixelUnion.dissolveWkt(repeated))
    assert(ps.nonEmpty)
  }

  test("3 corner children (vertex-touching, Sierpinski step) dissolve to 3 polygons, no hole") {
    randSids.foreach { parent =>
      val ps = polys(TrixelUnion.dissolveWkt(
        Array(child(parent, 0), child(parent, 1), child(parent, 2))))
      assert(ps.length === 3, s"parent $parent")
      assert(ps.forall(_.rings.length == 1))
      assert(ps.map(p => ringSet(p.rings(0))).toSet ===
        (0 until 3).map(i => cornersSet(child(parent, i))).toSet)
    }
  }

  test("vertex-touching corner children are separate polygons; disjoint cells too") {
    randSids.foreach { parent =>
      // children 0 and 1 share exactly one vertex (the v0-v1 edge midpoint)
      val ps = polys(TrixelUnion.dissolveWkt(Array(child(parent, 0), child(parent, 1))))
      assert(ps.length === 2, s"parent $parent")
      assert(ps.forall(p => p.rings.length == 1 && p.rings(0)._1.length == 4))
      assert(ps.map(p => ringSet(p.rings(0))).toSet ===
        Set(cornersSet(child(parent, 0)), cornersSet(child(parent, 1))))
    }
    val far = polys(TrixelUnion.dissolveWkt(Array(
      Htm.latLonToSid(45, 10, 6), Htm.latLonToSid(-45, -170, 6))))
    assert(far.length === 2)
  }

  test("mixed levels: a child expanded to its grandchildren dissolves like the child itself") {
    randSids.foreach { parent =>
      val c0 = child(parent, 0)
      val mixed = Array(child(c0, 0), child(c0, 1), child(c0, 2), child(c0, 3),
        child(parent, 1), child(parent, 2), child(parent, 3))
      val plain = Array.tabulate(4)(child(parent, _))
      assert(TrixelUnion.dissolveWkt(mixed) === TrixelUnion.dissolveWkt(plain),
        s"parent $parent")
    }
  }

  test("duplicates and nested cells are harmless; level-spread cap fails loudly") {
    val parent = Htm.latLonToSid(10, 10, 5)
    val withNoise = Array.tabulate(4)(child(parent, _)) ++
      Array(child(parent, 0), child(child(parent, 2), 1)) // dup + nested
    assert(TrixelUnion.dissolveWkt(withNoise) ===
      TrixelUnion.dissolveWkt(Array.tabulate(4)(child(parent, _))))
    val wide = Array(Htm.latLonToSid(10, 10, 0), Htm.latLonToSid(-60, 100, 27))
    val e = intercept[IllegalArgumentException](TrixelUnion.dissolveWkt(wide))
    assert(e.getMessage.contains("cap"))
  }

  test("global cross-validation: Gauss-Bonnet area of stitched rings == sum of trixel areas") {
    // two fully independent computations must agree: per-cell L'Huilier
    // excess summed over the (disjoint) cover vs the turning-angle area
    // of the dissolved polygon's stitched rings (holes subtracted)
    val boxes = Seq((5.0, 15.0, 40.0, 50.0, 6), (-60.0, -40.0, -30.0, -10.0, 5),
      (100.0, 140.0, 10.0, 35.0, 4), (170.0, 185.0, -20.0, 5.0, 5))
    boxes.foreach { case (lo1, lo2, la1, la2, lvl) =>
      val cover = Cover.coverFromBox(lo1, lo2, la1, la2, lvl)
      val direct = cover.map(Htm.area(_)).sum
      val stitched = Geo.sphericalWktArea(TrixelUnion.dissolveWkt(cover))
      assert(math.abs(stitched - direct) <= 1e-8 * direct + 1e-12,
        s"box $lo1..$lo2/$la1..$la2@$lvl: $stitched vs $direct")
    }
    // with a hole: 15 grandchildren = 15/16 of the parent by symmetry-free sum
    val parent = Sid.intervalLo(Htm.latLonToSid(20, 30, 4)) | 4L
    val missing = child(child(parent, 3), 3)
    val cells = (for (i <- 0 until 4; j <- 0 until 4) yield child(child(parent, i), j))
      .filterNot(_ == missing).toArray
    val direct = cells.map(Htm.area(_)).sum
    val stitched = Geo.sphericalWktArea(TrixelUnion.dissolveWkt(cells))
    assert(math.abs(stitched - direct) <= 1e-8 * direct + 1e-12)
    // and the Sierpinski 3-component case
    val tri = (0 until 3).map(child(parent, _)).toArray
    assert(math.abs(Geo.sphericalWktArea(TrixelUnion.dissolveWkt(tri)) -
      tri.map(Htm.area(_)).sum) <= 1e-8 * tri.map(Htm.area(_)).sum + 1e-12)
  }

  test("subset fuzz: random grandchild subsets (arbitrary pinches/holes/components) keep the area invariant") {
    // the Gauss-Bonnet total is a GLOBAL check on ring pairing: a merged
    // shell+hole, a dropped ring, or a mis-classified orientation all
    // corrupt the area, so agreement with the per-trixel sum validates
    // the stitcher across whatever pinch/hole topology the subset forms
    val r = new scala.util.Random(99)
    (1 to 120).foreach { trial =>
      val lat = r.nextDouble() * 160 - 80
      val lon = r.nextDouble() * 360 - 180
      val lvl = 2 + r.nextInt(7)
      val p = Sid.intervalLo(Htm.latLonToSid(lat, lon, lvl)) | lvl.toLong
      val all = for (i <- 0 until 4; j <- 0 until 4; k <- 0 until 4)
        yield child(child(child(p, i), j), k)
      val subset = all.filter(_ => r.nextDouble() < 0.55).toArray
      if (subset.nonEmpty) {
        val wkt = TrixelUnion.dissolveWkt(subset)
        val ps = polys(wkt)
        ps.foreach(_.rings.foreach { case (lons, lats2) =>
          assert(lons.head === lons.last && lats2.head === lats2.last)
        })
        val direct = subset.map(Htm.area(_)).sum
        val stitched = Geo.sphericalWktArea(wkt)
        assert(math.abs(stitched - direct) <= 1e-8 * direct + 1e-12,
          s"trial $trial parent $p: $stitched vs $direct\n$wkt")
      }
    }
  }

  test("box-cover dissolve: rings closed, shells CCW, every input cell covered (spot containment)") {
    val cover = Cover.coverFromBox(5, 15, 40, 50, 6)
    val ps = polys(TrixelUnion.dissolveWkt(cover))
    assert(ps.nonEmpty)
    ps.foreach { p =>
      p.rings.zipWithIndex.foreach { case ((lons, lats), i) =>
        assert(lons.head === lons.last && lats.head === lats.last) // closed
        assert(Geo.isCcw(lats, lons) === (i == 0)) // shell CCW, holes CW
      }
    }
    // boundary vertex count conservation: every surviving directed edge is
    // used exactly once across all rings
    val expanded = Sid.expandToLevel(cover, cover.map(Sid.level).max).distinct
    val totalRingEdges = ps.map(_.rings.map(_._1.length - 1).sum).sum
    assert(totalRingEdges <= 3 * expanded.length)
  }
}

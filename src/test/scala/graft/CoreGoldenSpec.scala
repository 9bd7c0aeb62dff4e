package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Sid, Htm, Tiv, Cover, Geo}

/** Bit-for-bit golden tests against constants frozen in the reference
  * repository's tests and docstrings (see FIXTURES.md §2 for the full
  * provenance table; pystare is not available in this sandbox, these
  * frozen values are the oracle). */
class CoreGoldenSpec extends AnyFunSuite {

  // --- point encode (spatial_conversions.py docstrings) ---------------
  test("latLonToSid matches golden point encodes") {
    assert(Htm.latLonToSid(20.0, 10.5, 27) === 4598246232954051067L)
    assert(Htm.latLonToSid(20.0, 10.5, 20) === 4598246232954051060L)
    assert(Htm.latLonToSid(55.3, 10.1, 15) === 4254264869405326191L)
    assert(Htm.latLonToSid(60.1, 20.9, 15) === 3640541580264132591L)
    assert(Htm.latLonToSid(34.25, -119.42, 20) === 3331752989521980116L)
    assert(Htm.latLonToSid(47.59, 7.51, 20) === 4271829667422230484L)
  }

  // --- level / hex (staredataframe.py:1061-1084) ----------------------
  test("level and hex") {
    assert(Sid.level(2251799813685252L) === 4)
    assert(Sid.hex(2251799813685252L) === "0x0008000000000004")
    assert(Sid.hex(4503599627370500L) === "0x0010000000000004")
    assert(Sid.level(0x3b0a000000000005L) === 5)
  }

  // --- coerce / clear (staredataframe.py:950-998) ---------------------
  test("coerce level rewrites only the level field") {
    val in = Array(2299437706637111721L, 2299435211084507593L, 2299566194809236969L)
    val want = Array(2299437706637111718L, 2299435211084507590L, 2299566194809236966L)
    assert(in.map(s => Sid.coerceLevel(s, 6)) === want)
  }

  test("clear to level zeroes sub-level location bits") {
    val in = Array(2299437706637111721L, 2299435211084507593L, 2299566194809236969L)
    val want = Array(2299437254470270985L, 2299435055447015433L, 2299564797819093001L)
    assert(in.map(Sid.clearToLevel) === want)
  }

  // --- compress (spatial_conversions.py:424-429) ----------------------
  test("compress absorbs children into present ancestor") {
    val sids = Array(4035225266123964416L, 4254212798004854789L, 4255901647865118724L)
    assert(Sid.compress(sids) === Array(4035225266123964416L))
  }

  // --- intersects (tests/test_intersects.py:37-42) --------------------
  test("sid set intersects") {
    val rows = Array(
      Array(4035225266123964416L),
      Array(4254212798004854789L, 4255901647865118724L))
    val cover = Sid.mergedIntervals(Array(4035225266123964416L))
    assert(rows.forall(r => Sid.anyIntersects(r, cover)))
  }

  test("intersects berlin/madrid vs germany-ish cover example") {
    // staredataframe.py:760-767 germany example cover
    val cover = Sid.mergedIntervals(Array(4251398048237748227L, 4269412446747230211L,
      4278419646001971203L, 4539628424389459971L, 4548635623644200963L, 4566650022153682947L))
    assert(Sid.anyIntersects(Array(4258121269174388239L), cover))
    assert(!Sid.anyIntersects(Array(4288120002905386575L), cover))
  }

  // --- trixel vertices (trixel_conversions.py docstrings) -------------
  private def approx(a: Double, b: Double, tol: Double = 5e-8): Boolean = math.abs(a - b) <= tol

  test("trixel vertices of sid 3") {
    val (lats, lons, clat, clon) = Htm.sidToVertices(3L)
    val wantLats = Array(-29.9999996, -38.92792794, -23.13179401)
    val wantLons = Array(9.73560999, 18.06057651, 19.71049975)
    assert(lats.zip(wantLats).forall { case (a, b) => approx(a, b) })
    assert(lons.zip(wantLons).forall { case (a, b) => approx(a, b) })
    assert(approx(clat, -30.75902492) && approx(clon, 15.84277554))
  }

  test("trixel corners of face-6 root") {
    val (lats, lons, _, _) = Htm.sidToVertices(3458764513820540928L)
    assert(lats.zip(Array(29.9999996, 45.00000069, 29.9999996)).forall { case (a, b) => approx(a, b) })
    assert(lons.zip(Array(-170.26439001, -45.0, 80.26439001)).forall { case (a, b) => approx(a, b) })
  }

  test("trixel centers, full-precision goldens") {
    val (lat1, lon1) = Htm.sidToCenter(2882303761517117440L)
    assert(approx(lat1, 24.09484285959212, 1e-10))
    assert(approx(lon1, -108.4349490979417, 1e-10))
    val (lat2, lon2) = Htm.sidToCenter(4611263805962321926L)
    assert(approx(lat2, 23.29074702177385, 1e-10))
    assert(approx(lon2, 19.50219017924583, 1e-10))
    val (lat3, lon3) = Htm.sidToCenter(4611404543450677254L)
    assert(approx(lat3, 25.34384175, 5e-8))
    assert(approx(lon3, 18.65957821, 5e-8))
    val (lat4, lon4) = Htm.sidToCenter(18014398509481987L)
    assert(approx(lat4, -23.46672972, 5e-8))
    assert(approx(lon4, 25.66446757, 5e-8))
  }

  test("trixel corners of level-6 sids") {
    val (lats, lons, _, _) = Htm.sidToVertices(4611263805962321926L)
    assert(lats.zip(Array(22.47991609, 24.53819039, 22.84521749)).forall { case (a, b) => approx(a, b) })
    assert(lons.zip(Array(20.55604548, 19.73607532, 18.21460548)).forall { case (a, b) => approx(a, b) })
  }

  // --- covers (spatial_conversions.py docstrings + tests) -------------
  test("triangle cover level 6") {
    val got = Cover.coverFromPolygon(
      Array((Array(0.0, 1.0, 1.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))), 6, forceCcw = true)
    assert(got === Array(4430697608402436102L, 4430838345890791430L, 4430979083379146758L))
  }

  test("triangle cover level 5 (ccw input, no force)") {
    val got = Cover.coverFromPolygon(
      Array((Array(0.0, 2.0, 1.0, 0.0), Array(0.0, 0.0, 1.0, 0.0))), 5, forceCcw = false)
    assert(got === Array(4423097784031248389L, 4430416133425725445L, 4430979083379146757L))
  }

  test("multipolygon cover level 5") {
    val p1 = Cover.coverFromPolygon(
      Array((Array(0.0, 1.0, 1.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))), 5, forceCcw = true)
    val p2 = Cover.coverFromPolygon(
      Array((Array(5.0, 6.0, 6.0, 5.0), Array(5.0, 6.0, 5.0, 5.0))), 5, forceCcw = true)
    assert((p1 ++ p2) === Array(4430416133425725445L, 4430979083379146757L, 4416905334543613957L))
  }

  test("south-africa box cover cardinality (tests/test_enclaves.py)") {
    val lons = Array(15.0, 35.0, 35.0, 15.0, 15.0)
    val lats = Array(-35.0, -35.0, -22.0, -22.0, -35.0)
    val got = Cover.coverFromPolygon(Array((lons, lats)), 5, forceCcw = true)
    assert(got.length === 65)
    // multi-res: fully-inside trixels surface at coarser levels
    assert(got.map(Sid.level).groupBy(identity).view.mapValues(_.length).toMap === Map(4 -> 5, 5 -> 60))
  }

  test("europe dissolve golden (tests/test_dissolve.py)") {
    val b1 = Cover.coverFromPolygon(
      Array((Array(-10.0, -5.0, -5.0, -10.0, -10.0), Array(40.0, 40.0, 50.0, 50.0, 40.0))), 4, forceCcw = true)
    val b2 = Cover.coverFromPolygon(
      Array((Array(0.0, 5.0, 5.0, 0.0, 0.0), Array(40.0, 40.0, 50.0, 50.0, 40.0))), 4, forceCcw = true)
    val dissolved = Sid.compress(b1 ++ b2)
    val want = Array(4262657047306174468L, 4269412446747230211L, 4278419646001971204L,
      4280671445815656452L, 4285175045443026948L, 4289678645070397444L, 4294182244697767940L,
      4300937644138823684L, 4318952042648305668L, 4548635623644200964L)
    assert(dissolved.sorted === want.sorted)
  }

  test("russia cover level 6 first sid (tests/test_parallel.py:46-49)") {
    val wkt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(getClass.getResource("/russia.wkt").toURI)), "UTF-8")
    val g = Geo.parseWkt(wkt).asInstanceOf[Geo.MultiPolygonG]
    val cover = g.polys.flatMap(p => Cover.coverFromPolygon(p.rings, 6, forceCcw = true))
    assert(cover(0) === 3999759419058421766L)
  }

  test("stare intersection of two polygon covers (staredataframe.py:824-834)") {
    // nodes1 = [[102,33],[101,35],[105,34],[104,33]] (lon,lat), level 5, force_ccw
    val c1 = Cover.coverFromPolygon(
      Array((Array(102.0, 101.0, 105.0, 104.0, 102.0), Array(33.0, 35.0, 34.0, 33.0, 33.0))), 5, forceCcw = true)
    val c2 = Cover.coverFromPolygon(
      Array((Array(102.0, 106.0, 106.0, 102.0, 102.0), Array(34.0, 35.0, 33.0, 33.5, 34.0))), 5, forceCcw = true)
    val inter = Sid.intersection(c1, c2)
    assert(inter === Array(694117292568477701L, 701435641962954757L, 701998591916376069L))
  }

  // --- ccw on sphere (tests/test_ccw.py) ------------------------------
  test("spherical ccw: antimeridian and poles") {
    // pacific ring crossing the antimeridian (ccw on sphere, cw planar)
    val pac = (Array(170.0, -170.0, -170.0, 170.0, 170.0), Array(-10.0, -10.0, 10.0, 10.0, -10.0))
    assert(Geo.isCcw(pac._2, pac._1))
    // ring around the north pole, ccw
    val np = (Array(0.0, 90.0, 180.0, -90.0, 0.0), Array(80.0, 80.0, 80.0, 80.0, 80.0))
    assert(Geo.isCcw(np._2, np._1))
    // ring around the south pole listed the same way is cw
    val sp = (Array(0.0, 90.0, 180.0, -90.0, 0.0), Array(-80.0, -80.0, -80.0, -80.0, -80.0))
    assert(!Geo.isCcw(sp._2, sp._1))
  }

  // --- antimeridian splitting (trixel_conversions.py:562-649) ---------
  test("splitAntimeridian: seam trigger, polar wide-span rings, pole-vertex expansion") {
    // fiji-style seam crosser: split into east + west, lons in range
    val fiji = Geo.splitAntimeridian(Array(179.0, -179.0, 179.5), Array(-17.0, -17.0, -16.0))
    assert(fiji.length === 2)
    assert(fiji.forall { case (lo, la) =>
      lo.length >= 3 && lo.forall(l => l >= -180 && l <= 180) && la.forall(l => l >= -18 && l <= -15) })
    assert(fiji.exists(_._1.forall(_ >= 179.0)) && fiji.exists(_._1.forall(_ <= -179.0)))

    // round-2 misfire: a polar trixel whose pole vertex carries an
    // arbitrary artifact longitude spans >180 deg of lon WITHOUT any
    // seam crossing (meridian edges at -60 and -120, base edge through
    // -90) — must stay whole; the old max-min>180 trigger split it
    val polar = Geo.splitAntimeridian(Array(139.7, -60.0, -120.0), Array(90.0, 85.0, 85.0))
    assert(polar.length === 1)
    assert(polar(0)._1 === Array(139.7, -60.0, -120.0))

    // pole-vertex trixel that DOES cross: base edge 170 -> -170 wraps.
    // The pole vertex (artifact lon 0) must expand into pole points on
    // its neighbours' meridians, not sweep planar lon 0..170
    val cross = Geo.splitAntimeridian(Array(0.0, 170.0, -170.0), Array(90.0, 85.0, 85.0))
    assert(cross.length === 2)
    val east = cross.find(_._1.forall(_ >= 0)).get
    val west = cross.find(_._1.forall(_ <= 0)).get
    assert(east._1.forall(l => l >= 170.0 && l <= 180.0), east._1.mkString(","))
    assert(west._1.forall(l => l >= -180.0 && l <= -170.0), west._1.mkString(","))
    assert((east._2 ++ west._2).forall(la => la >= 85.0 && la <= 90.0))
    // both pieces reach the pole (the pole passage was preserved)
    assert(east._2.max === 90.0 && west._2.max === 90.0)

    // drop semantics follow the same trigger
    assert(Geo.splitAntimeridian(Array(179.0, -179.0, 179.5), Array(-17.0, -17.0, -16.0),
      drop = true).isEmpty)
    assert(Geo.splitAntimeridian(Array(139.7, -60.0, -120.0), Array(90.0, 85.0, 85.0),
      drop = true).length === 1)
  }

  test("trixelWkt of polar + seam trixels emits structurally valid multipolygons") {
    // q26 emits WKT for arbitrary dissolved covers; face-root/level-1
    // trixels touch the poles and deep cells near (+/-90, 180) cross the
    // seam — every emitted ring must be closed, >= 4 points, in range
    val sids = Array(
      Htm.latLonToSid(89.9, 179.9, 2), Htm.latLonToSid(89.9, -179.9, 4),
      Htm.latLonToSid(-89.9, 179.9, 3), Htm.latLonToSid(89.99, 1.0, 1),
      Htm.latLonToSid(-17.0, 179.8, 9))
    val wkt = graft.functions.StareFunctions.trixelWkt(sids)
    assert(wkt.startsWith("MULTIPOLYGON ("))
    val rings = "\\(\\(([^()]*)\\)\\)".r.findAllMatchIn(wkt).map(_.group(1)).toArray
    assert(rings.length >= sids.length) // splits only add rings
    rings.foreach { r =>
      val pts = r.split(",").map(_.trim.split("\\s+").map(_.toDouble))
      assert(pts.length >= 4, s"ring too short: $r")
      assert(pts.head.sameElements(pts.last), s"ring not closed: $r")
      assert(pts.forall(p => p(0) >= -180 && p(0) <= 180 && p(1) >= -90 && p(1) <= 90),
        s"coordinate out of range: $r")
    }
  }

  // --- temporal index values (temporal_conversions.py:77-83) ----------
  test("tiv encode golden") {
    // 2021-09-03 00:00:00 UTC, 2021-07-17 11:16:00 UTC
    val t1 = java.time.Instant.parse("2021-09-03T00:00:00Z").toEpochMilli
    val t2 = java.time.Instant.parse("2021-07-17T11:16:00Z").toEpochMilli
    assert(Tiv.fromUtcMillis(t1) === 2276059438861267137L)
    assert(Tiv.fromUtcMillis(t2) === 2275939265676325057L)
  }

  test("tiv roundtrip and overlap") {
    val t1 = java.time.Instant.parse("2021-09-03T00:00:00Z").toEpochMilli
    val tiv = Tiv.fromUtcMillis(t1, 30, 30)
    assert(Tiv.toUtcMillis(tiv) === t1)
    val tiv2 = Tiv.fromUtcMillis(t1 + 60000, 30, 30)
    assert(Tiv.intersectionIfOverlap(tiv, tiv2) !== -1L)
    val tiv3 = Tiv.fromUtcMillis(t1 + 86400000L * 30, 48, 48)
    assert(Tiv.intersectionIfOverlap(tiv, tiv3) === -1L)
  }

  // --- structural properties ------------------------------------------
  test("pod directory increments (tests/data/pods fixture)") {
    assert(Sid.increment(4) === (1L << 51))
    assert(Sid.level(0x0a00000000000004L) === 4)
  }

  test("interval containment both directions") {
    val parent = 4035225266123964416L // face-7 level 0
    val child = 4254212798004854789L
    assert(Sid.intersects(parent, child))
    assert(Sid.intersects(child, parent))
    assert(!Sid.intersects(3L, parent))
  }
}

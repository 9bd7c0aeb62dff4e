package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Cover, Geo, Htm, Sid, Tiv}

/** Column-level STARE function library (SURVEY.md §2.5/§2.6).
  *
  * Design: pure bit-field algebra (level/clear/coerce/location/interval
  * bounds) is expressed with native Catalyst bitwise expressions so it
  * stays inside whole-stage codegen and remains usable in partition /
  * zone-map pruning predicates. Loop-heavy kernels (HTM descent, cover
  * generation, trixel geometry, TIV calendar math) are Scala UDFs over
  * primitives — one JVM call per row, no Python boundary.
  */
object StareFunctions {

  // ------------------------------------------------------------ bit algebra (native Catalyst, codegen'd)

  /** sid & 31 — spatial level (staredataframe.py:908-913). */
  def stareLevel(sid: Column): Column = sid.bitwiseAND(lit(31L))

  /** location bits only (join/compare key). */
  def stareLocation(sid: Column): Column = sid.bitwiseAND(lit(Sid.LocMask))

  /** clear location bits below `level` and stamp the level field —
    * the canonical equi-join / partition key. Native when level is a literal. */
  def stareClearTo(sid: Column, level: Int): Column =
    sid.bitwiseAND(lit(Sid.clearMask(level))).bitwiseOR(lit(level.toLong))

  /** pod / partition id at a level: cleared location only. */
  def starePod(sid: Column, level: Int): Column =
    sid.bitwiseAND(lit(Sid.clearMask(level)))

  /** interval bounds of a fixed-level trixel key. */
  def stareIntervalLo(sid: Column, level: Int): Column = sid.bitwiseAND(lit(Sid.clearMask(level)))
  def stareIntervalHi(sid: Column, level: Int): Column =
    stareIntervalLo(sid, level) + lit(Sid.increment(level))

  def stareCoerce(sid: Column, level: Int): Column =
    sid.bitwiseAND(lit(~Sid.LevelMask)).bitwiseOR(lit(level.toLong))

  def stareHex(sid: Column): Column = format_string("0x%016x", sid)

  // ------------------------------------------------------------ kernels (Scala UDFs)

  /** lat/lon (degrees) -> SID at level: native codegen expression. */
  def stareSid(lat: Column, lon: Column, level: Int): Column =
    NativeExpressions.stareSidNative(lat, lon, lit(level))

  /** clear to the sid's own level (dynamic level variant): native codegen. */
  def stareClearToOwn(sid: Column): Column = NativeExpressions.stareClearNative(sid)

  private val coverUdf = udf((wkt: String, level: Int, forceCcw: Boolean) => {
    Geo.parseWkt(wkt) match {
      case Geo.PointG(lon, lat) => Array(Htm.latLonToSid(lat, lon, level))
      case Geo.PolygonG(rings)  => Cover.coverFromPolygon(rings, level, forceCcw)
      case Geo.MultiPolygonG(ps) => ps.flatMap(p => Cover.coverFromPolygon(p.rings, level, forceCcw))
    }
  })

  /** WKT geometry -> multi-res SID cover (sids_from_shapely semantics). */
  def stareCover(wkt: Column, level: Int, forceCcw: Boolean = true): Column =
    coverUdf(wkt, lit(level), lit(forceCcw))

  private val circularUdf = udf((sid: Long, diameterDeg: Double, level: Int) =>
    Cover.circularCover(sid, diameterDeg, level))

  /** circular cover of given diameter (deg) around the sid's trixel center. */
  def stareCircularCover(sid: Column, diameterDeg: Column, level: Int): Column =
    circularUdf(sid, diameterDeg, lit(level))

  private val ellipseUdf = udf((lat: Double, lon: Double, widthM: Double, heightM: Double,
                                angleDeg: Double, level: Int) =>
    Cover.ellipseCover(lat, lon, widthM, heightM, angleDeg, level))

  /** elliptical cover around a lat/lon center (make_ellipse_sids,
    * io/granules/modis.py:548-598): axis lengths in meters, angle ccw
    * from east (= 90 - sensor azimuth in the reference). */
  def stareEllipseCover(lat: Column, lon: Column, widthM: Column, heightM: Column,
                        angleDeg: Column, level: Int): Column =
    ellipseUdf(lat, lon, widthM, heightM, angleDeg, lit(level))

  private val expandUdf = udf((sids: Seq[Long], level: Int) => Sid.expandToLevel(sids.toArray, level))
  def stareExpand(sids: Column, level: Int): Column = expandUdf(sids, lit(level))

  private val compressUdf = udf((sids: Seq[Long]) => Sid.compress(sids.toArray))
  def stareCompress(sids: Column): Column = compressUdf(sids)

  private val intersectionUdf = udf((a: Seq[Long], b: Seq[Long]) => Sid.intersection(a.toArray, b.toArray))
  def stareCoverIntersection(a: Column, b: Column): Column = intersectionUdf(a, b)

  private val areaUdf = udf((sid: Long) => Htm.area(sid))
  def stareArea(sid: Column): Column = areaUdf(sid)

  private val trixelWktUdf = udf((sids: Seq[Long]) => trixelWkt(sids.toArray))
  /** MultiPolygon WKT of the trixels of a cover, antimeridian-split. */
  def stareTrixelWkt(sids: Column): Column = trixelWktUdf(sids)

  private val centerUdf = udf((sid: Long) => { val (lat, lon) = Htm.sidToCenter(sid); Array(lon, lat) })
  /** [lon, lat] of the trixel center. */
  def stareCenter(sid: Column): Column = centerUdf(sid)

  private val hullUdf = udf((wkt: String, level: Int) => {
    Geo.parseWkt(wkt) match {
      case Geo.PointG(lon, lat)  => Array(Htm.latLonToSid(lat, lon, level))
      case Geo.PolygonG(rings)   => Cover.coverFromHull(rings(0)._2, rings(0)._1, level)
      case Geo.MultiPolygonG(ps) => ps.flatMap(p => Cover.coverFromHull(p.rings(0)._2, p.rings(0)._1, level))
    }
  })

  /** convex-hull cover (sids_from_* convex=True). */
  def stareCoverHull(wkt: Column, level: Int): Column = hullUdf(wkt, lit(level))

  private val adaptiveSidUdf = udf((lat: Double, lon: Double, dist: Double) =>
    Htm.latLonToSid(lat, lon, Htm.adaptiveLevel(dist)))

  /** adaptive-level point encode: level from an explicit neighbor
    * distance (deg) — from_latlon_2d(adapt_level=True) semantics. */
  def stareSidAdaptive(lat: Column, lon: Column, neighborDistDeg: Column): Column =
    adaptiveSidUdf(lat, lon, neighborDistDeg)

  private val containsPointUdf = udf((sid: Long, lat: Double, lon: Double) =>
    Htm.sidContainsPoint(sid, lat, lon))

  /** does the sid's trixel contain the lat/lon point? Cross-validates
    * the encode descent through the independent gring half-space path. */
  def stareContainsPoint(sid: Column, lat: Column, lon: Column): Column =
    containsPointUdf(sid, lat, lon)

  private val reencodeOkUdf = udf((sid: Long) => {
    val (la, lo) = Htm.sidToCenter(sid)
    // compare at the sid's own level: encode keeps full-depth location
    // bits below the stamped level (pystare-compatible), which differ
    // between the original point and the trixel center
    Sid.clearToLevel(Htm.latLonToSid(la, lo, Sid.level(sid))) == Sid.clearToLevel(sid)
  })

  /** decode-center -> re-encode roundtrip invariant (center is strictly
    * interior, so this must hold for every valid sid). */
  def stareCenterRoundtripOk(sid: Column): Column = reencodeOkUdf(sid)

  private val gringUdf = udf((sid: Long) => Htm.sidToGring(sid).map(_.toSeq))
  /** 3 great-circle normals constraining the trixel. */
  def stareGring(sid: Column): Column = gringUdf(sid)

  private val cornersEcefUdf = udf((sid: Long) => Htm.sidToCornersEcef(sid).map(_.toSeq))
  def stareCornersEcef(sid: Column): Column = cornersEcefUdf(sid)

  private val tivUdf = udf((millis: Long, fwd: Int, rev: Int) => Tiv.fromUtcMillis(millis, fwd, rev))
  /** timestamp -> STARE temporal index value. */
  def stareTiv(ts: Column, forwardRes: Int = 48, reverseRes: Int = 48): Column =
    tivUdf((ts.cast("double") * 1000).cast("long"), lit(forwardRes), lit(reverseRes))

  private val tivRangeUdf = udf((a: Long, b: Long) => Tiv.fromInterval(a, b))
  /** interval TIV from (tsMin, tsMax) — temporal pod chunk id. */
  def stareTivRange(tsMin: Column, tsMax: Column): Column =
    tivRangeUdf((tsMin.cast("double") * 1000).cast("long"), (tsMax.cast("double") * 1000).cast("long"))

  // ------------------------------------------------------------ predicates against a driver-side cover

  /** Predicate column: does the row's scalar sid intersect the cover?
    * The cover is prepared once on the driver (merged interval runs) and
    * shipped as a codegen reference object — the per-row test is an
    * allocation-free binary search inside whole-stage codegen, so
    * SpeedySubset and pod-read refines never fall out of the generated
    * loop. Mirrors stare_intersects (staredataframe.py:741-784). */
  def stareIntersectsCover(sid: Column, cover: Array[Long]): Column =
    NativeExpressions.stareIntersectsCoverNative(sid,
      Sid.flattenRuns(Sid.mergedIntervals(cover)))

  /** Same for rows holding sid sets. */
  def stareSetIntersectsCover(sids: Column, cover: Array[Long]): Column = {
    val runs = Sid.mergedIntervals(cover)
    val f = udf((s: Seq[Long]) => Sid.anyIntersects(s.toArray, runs))
    f(sids)
  }

  /** A pushdown-friendly coarse pre-filter for a cover: sid between the
    * cover's global [min, max) bounds — pure comparisons, reaches
    * parquet zone maps (speedy_subset semantics,
    * spatial_conversions.py:557-600). */
  def stareCoverBoundsFilter(sid: Column, cover: Array[Long]): Column = {
    val runs = Sid.mergedIntervals(cover)
    val lo = runs.head._1
    val hi = runs.last._2
    sid >= lo && sid < hi
  }

  // ------------------------------------------------------------ helpers

  def trixelWkt(sids: Array[Long]): String = {
    val polys = sids.flatMap { s =>
      val (lats, lons, _, _) = Htm.sidToVertices(s)
      Geo.splitAntimeridian(lons, lats)
    }
    polys.map { case (lons, lats) =>
      val pts = (lons.indices :+ 0).map(i => s"${lons(i)} ${lats(i)}").mkString(", ")
      s"(($pts))"
    }.mkString("MULTIPOLYGON (", ", ", ")")
  }

  /** Register SQL names on a session (spark.sql usable). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("stare_sid", (lat: Double, lon: Double, level: Int) => Htm.latLonToSid(lat, lon, level))
    spark.udf.register("stare_level", (sid: Long) => Sid.level(sid))
    spark.udf.register("stare_clear", (sid: Long) => Sid.clearToLevel(sid))
    spark.udf.register("stare_hex", (sid: Long) => Sid.hex(sid))
    spark.udf.register("stare_area", (sid: Long) => Htm.area(sid))
    spark.udf.register("stare_compress", (sids: Seq[Long]) => Sid.compress(sids.toArray))
    spark.udf.register("stare_cover", (wkt: String, level: Int) => {
      Geo.parseWkt(wkt) match {
        case Geo.PointG(lon, lat)  => Array(Htm.latLonToSid(lat, lon, level))
        case Geo.PolygonG(rings)   => Cover.coverFromPolygon(rings, level, forceCcw = true)
        case Geo.MultiPolygonG(ps) => ps.flatMap(p => Cover.coverFromPolygon(p.rings, level, forceCcw = true))
      }
    })
    spark.udf.register("stare_ellipse_cover",
      (lat: Double, lon: Double, widthM: Double, heightM: Double, angleDeg: Double, level: Int) =>
        Cover.ellipseCover(lat, lon, widthM, heightM, angleDeg, level))
    spark.udf.register("stare_tiv", (millis: Long, fwd: Int, rev: Int) => Tiv.fromUtcMillis(millis, fwd, rev))
    spark.udf.register("stare_trixel_wkt", (sids: Seq[Long]) => trixelWkt(sids.toArray))
  }
}

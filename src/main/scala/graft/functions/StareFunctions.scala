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

  private val dissolveWktUdf = udf((sids: Seq[Long]) =>
    // empty/null cover -> null geometry (the reference's unary_union of
    // nothing is an empty geometry, not a job abort)
    if (sids == null || sids.isEmpty) null
    else graft.core.TrixelUnion.dissolveWkt(sids.toArray))
  /** dissolve(geom=True): exact geometry UNION of the trixel set — shared
    * boundaries removed, holes preserved (core.TrixelUnion; closes the
    * reference's geopandas-delegated staredataframe.py:884-886). UDF
    * justified: per-group geometry construction over a collected sid
    * array, no built-in equivalent. */
  def stareDissolveWkt(sids: Column): Column = dissolveWktUdf(sids)

  private val wktAreaUdf = udf((wkt: String) =>
    Option(wkt).map(graft.core.Geo.sphericalWktArea))
  /** Gauss–Bonnet spherical area (steradians, unit sphere) of a
    * geodesic-edged (multi)polygon WKT — shells add, holes subtract.
    * Cross-validated against per-trixel L'Huilier sums (TrixelUnionSpec). */
  def stareWktArea(wkt: Column): Column = wktAreaUdf(wkt)

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

  // ------------------------------------------------------------ SQL surface

  private val clearToDynUdf = udf((sid: Long, level: Int) =>
    (sid & Sid.clearMask(level)) | level.toLong)
  /** clearToLevel with a per-row (non-literal) target level. */
  def stareClearToDyn(sid: Column, level: Column): Column = clearToDynUdf(sid, level)
  private val expandDynUdf = udf((sids: Seq[Long], level: Int) =>
    Sid.expandToLevel(sids.toArray, level))
  private val tivMillisUdf = udf((millis: Long, fwd: Int, rev: Int) =>
    Tiv.fromUtcMillis(millis, fwd, rev))
  private val tivIntervalUdf = udf((lo: Long, hi: Long) => Tiv.fromInterval(lo, hi))
  private val containsDynUdf = udf((sid: Long, lat: Double, lon: Double) =>
    Htm.sidContainsPoint(sid, lat, lon))
  private val setIntersectsUdf = udf((a: Seq[Long], b: Seq[Long]) =>
    Sid.intersection(a.toArray, b.toArray).nonEmpty)

  /** The full STARE SQL surface as (name, arity, expression builder) —
    * the single source of truth behind BOTH registration paths:
    * StareExtensions injects it at session build (`--conf
    * spark.sql.extensions=graft.StareExtensions`, the spark-submit /
    * SQL-only path) and register() installs it on a live session.
    * Mirrors the reference's dataframe-method surface
    * (staredataframe.py:741-1084) for pure-SQL users; hot kernels
    * (stare_sid, stare_clear, stare_intersects_cover) resolve to the
    * native codegen expressions, the rest to the same UDF kernels the
    * typed API uses. */
  lazy val sqlFunctionBuilders: Seq[(String, Int, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.graft.shim
    // eagerExpression: a registry builder's output never passes through
    // the Dataset-API analyzer, so the Column tree must convert eagerly
    def c(b: Seq[Column] => Column): Seq[Expression] => Expression =
      exprs => shim.eagerExpression(b(exprs.map(shim.column)))
    def long(x: Column) = x.cast("long")
    def int(x: Column) = x.cast("int")
    def dbl(x: Column) = x.cast("double")
    Seq[(String, Int, Seq[Expression] => Expression)](
      ("stare_sid", 3, c(cs => NativeExpressions.stareSidNative(cs(0), cs(1), cs(2)))),
      ("stare_clear", 1, c(cs => stareClearToOwn(long(cs(0))))),
      ("stare_level", 1, c(cs => stareLevel(long(cs(0))))),
      ("stare_clear_to", 2, c(cs => clearToDynUdf(long(cs(0)), int(cs(1))))),
      ("stare_coerce", 2, c(cs =>
        long(cs(0)).bitwiseAND(lit(~Sid.LevelMask)).bitwiseOR(long(cs(1))))),
      ("stare_hex", 1, c(cs => stareHex(long(cs(0))))),
      ("stare_area", 1, c(cs => areaUdf(long(cs(0))))),
      ("stare_compress", 1, c(cs => compressUdf(cs(0)))),
      ("stare_expand", 2, c(cs => expandDynUdf(cs(0), int(cs(1))))),
      ("stare_intersection", 2, c(cs => intersectionUdf(cs(0), cs(1)))),
      ("stare_set_intersects", 2, c(cs => setIntersectsUdf(cs(0), cs(1)))),
      ("stare_cover", 2, c(cs => coverUdf(cs(0), int(cs(1)), lit(true)))),
      ("stare_cover_hull", 2, c(cs => hullUdf(cs(0), int(cs(1))))),
      ("stare_circular_cover", 3, c(cs => circularUdf(long(cs(0)), dbl(cs(1)), int(cs(2))))),
      ("stare_ellipse_cover", 6, c(cs =>
        ellipseUdf(dbl(cs(0)), dbl(cs(1)), dbl(cs(2)), dbl(cs(3)), dbl(cs(4)), int(cs(5))))),
      ("stare_sid_adaptive", 3, c(cs => adaptiveSidUdf(dbl(cs(0)), dbl(cs(1)), dbl(cs(2))))),
      ("stare_contains_point", 3, c(cs => containsDynUdf(long(cs(0)), dbl(cs(1)), dbl(cs(2))))),
      ("stare_center", 1, c(cs => centerUdf(long(cs(0))))),
      ("stare_gring", 1, c(cs => gringUdf(long(cs(0))))),
      ("stare_corners_ecef", 1, c(cs => cornersEcefUdf(long(cs(0))))),
      ("stare_trixel_wkt", 1, c(cs => trixelWktUdf(cs(0)))),
      ("stare_dissolve_wkt", 1, c(cs => dissolveWktUdf(cs(0)))),
      ("stare_wkt_area", 1, c(cs => wktAreaUdf(cs(0)))),
      ("stare_tiv", 3, c(cs => tivMillisUdf(long(cs(0)), int(cs(1)), int(cs(2))))),
      ("stare_tiv_range", 2, c(cs => tivIntervalUdf(long(cs(0)), long(cs(1))))),
      // driver-prepared cover predicate: the cover argument must be a
      // foldable array literal so the merged interval runs ship once as
      // a codegen reference object (the same native path the typed
      // stareIntersectsCover uses)
      ("stare_intersects_cover", 2, exprs => {
        require(exprs(1).foldable, "the cover must be a foldable array literal")
        val arr = exprs(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
        StareIntersectsCoverExpression(
          shim.eagerExpression(shim.column(exprs(0)).cast("long")),
          Sid.flattenRuns(Sid.mergedIntervals(arr)))
      }),
      // text-pipeline surface: the LLM-data ops (dedup signatures,
      // similarity, language ID, quality primitives) through plain SQL —
      // the exact kernels graft.pipeline.{TextOps,AnnOps} use, so SQL
      // results match the typed API bit-for-bit
      ("text_simhash", 1, c(cs => graft.pipeline.TextOps.simhash(cs(0)))),
      ("text_fingerprint", 1, c(cs => graft.pipeline.TextOps.fingerprint(cs(0)))),
      ("text_token_count", 1, c(cs => graft.pipeline.TextOps.tokenCount(cs(0)))),
      ("text_lang_id", 1, c(cs => graft.pipeline.TextOps.langId(cs(0)))),
      ("text_shingle_jaccard", 3, c(cs =>
        graft.pipeline.TextOps.shingleJaccard(cs(0), cs(1), int(cs(2))))),
      ("text_ngram_jaccard", 2, c(cs => graft.pipeline.TextOps.ngramJaccard(cs(0), cs(1)))),
      ("text_minhash", 3, c(cs =>
        graft.pipeline.TextOps.minhashSignature(cs(0), int(cs(1)), int(cs(2))))),
      ("text_shingle_hashes", 2, c(cs =>
        graft.pipeline.TextOps.shingleHashes(cs(0), int(cs(1))))),
      ("text_hashed_jaccard", 2, c(cs =>
        graft.pipeline.TextOps.hashedJaccard(cs(0), cs(1)))),
      ("emb_cosine", 2, c(cs => graft.pipeline.AnnOps.cosine(
        cs(0).cast("array<float>"), cs(1).cast("array<float>")))),
      ("emb_lsh_sig", 3, c(cs => graft.pipeline.AnnOps.lshSignature(
        cs(0).cast("array<float>"), int(cs(1)), int(cs(2))))))
  }

  /** Register the full SQL surface on a LIVE session (spark.sql usable
    * without rebuilding the session; same builders as StareExtensions). */
  def register(spark: SparkSession): Unit =
    sqlFunctionBuilders.foreach { case (name, arity, b) =>
      org.apache.spark.sql.graft.shim.registerFunction(spark, name,
        exprs => { require(exprs.length == arity, s"$name expects $arity arguments"); b(exprs) })
    }
}

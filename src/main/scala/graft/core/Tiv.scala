package graft.core

/** STARE temporal index values (TIVs) — from-scratch encode/decode.
  *
  * The reference delegates to pystare.from_julian_date
  * (/root/reference/starepandas/tools/temporal_conversions.py:85-89);
  * the bit layout below was decoded from the two golden TIVs frozen in
  * that docstring ('2021-09-03' -> 2276059438861267137,
  * '2021-07-17 11:16' -> 2275939265676325057):
  *
  *   bits 0..1   type (1 = instant)
  *   bits 2..7   reverse resolution (0..48)
  *   bits 8..13  forward resolution (0..48)
  *   bits 14..23 millisecond (0..999)
  *   bits 24..29 second      (0..61)
  *   bits 30..35 minute      (0..59)
  *   bits 36..40 hour        (0..23)
  *   bits 41..43 "day-of-week"  = (dayOfYear-1) % 7
  *   bits 44..45 "week-of-month"= ((dayOfYear-1) % 28) / 7
  *   bits 46..49 "month"        = (dayOfYear-1) / 28        (0..13)
  *   bits 50..62 year (CE)
  *
  * i.e. the calendar part is the year plus a uniform 13×28-day
  * decomposition of the day-of-year. Fields are computed on the TAI
  * timeline: the golden values carry second=37 for UTC-midnight inputs,
  * the TAI-UTC offset in 2021.
  *
  * Resolution-to-unit table (temporal_conversions.py:13-55): 48-39 ms,
  * 38-33 s, 32-27 min, 26-22 h, 21-19 day, 18-17 week, 16-13 month,
  * 12-0 year.
  */
object Tiv {
  /** (UTC epoch seconds when offset takes effect, TAI-UTC seconds). IERS
    * leap second table, 1972+. Public data; no leaps since 2017-01-01. */
  private val leapTable: Array[(Long, Int)] = Array(
    (78796800L, 11), (94694400L, 12), (126230400L, 13), (157766400L, 14),
    (189302400L, 15), (220924800L, 16), (252460800L, 17), (283996800L, 18),
    (315532800L, 19), (362793600L, 20), (394329600L, 21), (425865600L, 22),
    (489024000L, 23), (567993600L, 24), (631152000L, 25), (662688000L, 26),
    (709948800L, 27), (741484800L, 28), (773020800L, 29), (820454400L, 30),
    (867715200L, 31), (915148800L, 32), (1136073600L, 33), (1230768000L, 34),
    (1341100800L, 35), (1435708800L, 36), (1483228800L, 37))

  def taiMinusUtcSeconds(utcEpochSec: Long): Int = {
    var off = 10
    var i = 0
    while (i < leapTable.length && utcEpochSec >= leapTable(i)._1) { off = leapTable(i)._2; i += 1 }
    off
  }

  private final val MsPerDay = 86400000L

  /** UTC epoch milliseconds -> TIV with the given resolutions. */
  def fromUtcMillis(utcMillis: Long, forwardRes: Int = 48, reverseRes: Int = 48): Long = {
    val taiMillis = utcMillis + taiMinusUtcSeconds(utcMillis / 1000L).toLong * 1000L
    val days = math.floorDiv(taiMillis, MsPerDay)
    val msOfDay = math.floorMod(taiMillis, MsPerDay)
    val (year, doy) = civilFromDays(days)
    val ms = msOfDay % 1000
    val totalSec = msOfDay / 1000
    val sec = totalSec % 60
    val min = (totalSec / 60) % 60
    val hour = totalSec / 3600
    val d0 = doy - 1
    val dow = d0 % 7
    val wom = (d0 % 28) / 7
    val month = d0 / 28
    (year.toLong << 50) | (month.toLong << 46) | (wom.toLong << 44) | (dow.toLong << 41) |
      (hour << 36) | (min << 30) | (sec << 24) | (ms << 14) |
      (forwardRes.toLong << 8) | (reverseRes.toLong << 2) | 1L
  }

  /** TIV -> UTC epoch milliseconds of the encoded instant. */
  def toUtcMillis(tiv: Long): Long = {
    val year = ((tiv >> 50) & 0x1FFF).toInt
    val month = ((tiv >> 46) & 15).toInt
    val wom = ((tiv >> 44) & 3).toInt
    val dow = ((tiv >> 41) & 7).toInt
    val hour = (tiv >> 36) & 31
    val min = (tiv >> 30) & 63
    val sec = (tiv >> 24) & 63
    val ms = (tiv >> 14) & 1023
    val doy = month * 28 + wom * 7 + dow + 1
    val days = daysFromCivil(year, doy)
    val taiMillis = days * MsPerDay + hour * 3600000L + min * 60000L + sec * 1000L + ms
    // invert TAI->UTC (offset varies slowly; one fixup step suffices)
    var utc = taiMillis - taiMinusUtcSeconds(taiMillis / 1000L).toLong * 1000L
    utc = taiMillis - taiMinusUtcSeconds(utc / 1000L).toLong * 1000L
    utc
  }

  def forwardRes(tiv: Long): Int = ((tiv >> 8) & 63).toInt
  def reverseRes(tiv: Long): Int = ((tiv >> 2) & 63).toInt

  /** Duration in ms of one unit at a STARE temporal resolution. */
  def resolutionMillis(res: Int): Long = {
    require(res >= 0 && res <= 48, s"bad temporal resolution $res")
    if (res >= 39) 1L << (48 - res) // ms: 1..512
    else if (res >= 33) 1000L << (38 - res) // s: 1..32
    else if (res >= 27) 60000L << (32 - res) // min
    else if (res >= 22) 3600000L << (26 - res) // h
    else if (res >= 19) 86400000L << (21 - res) // day
    else if (res >= 17) 7L * 86400000L << (18 - res) // week
    else if (res >= 13) 28L * 86400000L << (16 - res) // 28-day month
    else 364L * 86400000L << (12 - res) // 364-day year
  }

  /** The [start, end) interval (UTC ms) a TIV stands for: reverse
    * resolution backwards from the instant, forward resolution onwards
    * (pod temporal pruning semantics, reference io/pod.py:189-230). */
  def interval(tiv: Long): (Long, Long) = {
    val t = toUtcMillis(tiv)
    (t - resolutionMillis(reverseRes(tiv)), t + resolutionMillis(forwardRes(tiv)))
  }

  /** coarsest resolution whose unit duration is <= the given span
    * (pystare.coarsest_resolution_finer_or_equal_ms). */
  def coarsestResolutionFinerOrEqualMs(spanMs: Long): Int = {
    var res = 0
    while (res < 48 && resolutionMillis(res) > spanMs) res += 1
    res
  }

  /** Interval TIV for [startMs, endMs]: centered instant with forward /
    * reverse resolutions sized to the half-spans — the temporal chunk id
    * of write_pods_granule (reference staredataframe.py:1160-1167). */
  def fromInterval(startMs: Long, endMs: Long): Long = {
    val center = (startMs + endMs) / 2
    val fwd = coarsestResolutionFinerOrEqualMs(math.max(1L, endMs - center))
    val rev = coarsestResolutionFinerOrEqualMs(math.max(1L, center - startMs))
    fromUtcMillis(center, fwd, rev)
  }

  /** Interval TIV guaranteed to COVER [startMs, endMs]: like
    * fromInterval but each resolution steps one unit coarser when the
    * finer-or-equal unit undershoots its half-span, so interval(tiv) ⊇
    * [startMs, endMs]. This is the safe direction for partition-pruning
    * manifests (a chunk may only look BIGGER than it is, never smaller). */
  def fromIntervalCovering(startMs: Long, endMs: Long): Long = {
    val center = (startMs + endMs) / 2
    def covering(span: Long): Int = {
      val s = math.max(1L, span)
      val r = coarsestResolutionFinerOrEqualMs(s)
      if (resolutionMillis(r) >= s) r else math.max(0, r - 1)
    }
    fromUtcMillis(center, covering(endMs - center), covering(center - startMs))
  }

  /** Overlap test mirroring temporal_value_intersection_if_overlap
    * (-1 = no overlap). Returns the midpoint TIV of the overlap. */
  def intersectionIfOverlap(a: Long, b: Long): Long = {
    val (a0, a1) = interval(a); val (b0, b1) = interval(b)
    val lo = math.max(a0, b0); val hi = math.min(a1, b1)
    if (lo > hi) -1L
    else fromUtcMillis((lo + hi) / 2, forwardRes(a), reverseRes(a))
  }

  /** days since 1970-01-01 -> (year CE, day-of-year 1..366), proleptic Gregorian. */
  def civilFromDays(days: Long): (Int, Int) = {
    // Howard Hinnant's civil_from_days
    var z = days + 719468
    val era = math.floorDiv(z, 146097)
    val doe = (z - era * 146097).toInt
    val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365
    val y = yoe + era.toInt * 400
    val doyMarch = doe - (365 * yoe + yoe / 4 - yoe / 100) // day within March-based year
    val mp = (5 * doyMarch + 2) / 153
    val d = doyMarch - (153 * mp + 2) / 5 + 1
    val m = if (mp < 10) mp + 3 else mp - 9
    val year = if (m <= 2) y + 1 else y
    // day-of-year from (year, m, d)
    val leap = (year % 4 == 0 && year % 100 != 0) || year % 400 == 0
    val cum = Array(0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)
    val doy = cum(m - 1) + d + (if (leap && m > 2) 1 else 0)
    (year, doy)
  }

  /** (year CE, day-of-year) -> days since 1970-01-01. */
  def daysFromCivil(year: Int, doy: Int): Long = {
    val y = year - 1
    val daysToYear = y.toLong * 365 + y / 4 - y / 100 + y / 400
    daysToYear + doy - 719163L // 719162 days from 0001-01-01 to 1970-01-01, +1 for doy origin
  }
}

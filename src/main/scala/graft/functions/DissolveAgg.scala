package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import graft.core.Sid

import scala.collection.mutable.ArrayBuffer

/** Distributed STARE dissolve aggregate: per group, union all SID-set
  * intervals and emit the canonical multi-resolution cover.
  *
  * Semantics of stare_dissolve / compress_sids (reference
  * staredataframe.py:841-906, tools/spatial_conversions.py:403-439).
  * Interval union is associative and commutative, so Spark's partial
  * (map-side) + final (reduce-side) aggregation computes the exact
  * result — unlike the reference, which funnels each group through a
  * single process.
  *
  * Buffer = Array[Long] with a one-slot header: buf(0) = used longs,
  * then [lo, hi) interval pairs, possibly UNSORTED/OVERLAPPING, with
  * capacity slack at the tail. Rows append IN PLACE (the aggregator
  * buffer is a live object under ObjectHashAggregate, so mutating and
  * returning the same reference is legal); the buffer compacts
  * (sort + merge) only when the pair count crosses a threshold.
  * Copy-per-append cost O(|group|^2) made an 8M-row dissolve take 81 s;
  * this form is amortized O(1) per row.
  */
object DissolveAgg extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  /** compact when the raw size doubles past the last compacted size
    * (an absolute threshold degenerates to compact-per-append once the
    * merged result itself exceeds it). */
  private final val MinCompactPairs = 1 << 12

  override def zero: Array[Long] = Array.emptyLongArray

  // header: buf(0) = used longs (excluding 2-slot header),
  //         buf(1) = used longs at the last compaction (watermark)
  private final val H = 2
  @inline private def used(buf: Array[Long]): Int = if (buf.isEmpty) 0 else buf(0).toInt
  @inline private def watermark(buf: Array[Long]): Int = if (buf.isEmpty) 0 else buf(1).toInt
  @inline private def shouldCompact(buf: Array[Long]): Boolean = {
    val u = used(buf)
    u / 2 > MinCompactPairs && u > 2 * math.max(watermark(buf), MinCompactPairs)
  }

  override def reduce(buf: Array[Long], sids: Array[Long]): Array[Long] = {
    if (sids == null || sids.isEmpty) return buf
    var b = ensureCapacity(buf, sids.length * 2)
    var w = used(b) + H
    var i = 0
    while (i < sids.length) {
      b(w) = Sid.intervalLo(sids(i)); b(w + 1) = Sid.intervalHi(sids(i))
      w += 2; i += 1
    }
    b(0) = (w - H).toLong
    if (shouldCompact(b)) b = compact(b)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    val bn = used(b)
    var out = ensureCapacity(a, bn)
    System.arraycopy(b, H, out, used(out) + H, bn)
    out(0) = (used(out) + bn).toLong
    if (shouldCompact(out)) out = compact(out)
    out
  }

  override def finish(buf: Array[Long]): Array[Long] = {
    val c = compact(buf)
    val n = used(c)
    val out = new ArrayBuffer[Long]()
    var i = H
    while (i < H + n) {
      emit(c(i), c(i + 1), out)
      i += 2
    }
    out.toArray
  }

  /** grow (2x) so `extra` more longs fit after the used region. */
  private def ensureCapacity(buf: Array[Long], extra: Int): Array[Long] = {
    val n = used(buf)
    val need = H + n + extra
    if (buf.length >= need) buf
    else {
      val cap = math.max(need, math.max(64, buf.length * 2))
      val out = new Array[Long](cap)
      if (buf.nonEmpty) System.arraycopy(buf, 0, out, 0, H + n)
      else { out(0) = 0L; out(1) = 0L }
      out
    }
  }

  /** sort interval pairs by lo, merge overlaps/adjacency; trims slack. */
  private def compact(buf: Array[Long]): Array[Long] = {
    val n = used(buf) / 2
    if (n <= 1) return buf
    val idx = Array.range(0, n).sortBy(i => buf(H + 2 * i))
    val out = new ArrayBuffer[Long](2 * n + H)
    out += 0L; out += 0L
    var curLo = buf(H + 2 * idx(0)); var curHi = buf(H + 1 + 2 * idx(0))
    var k = 1
    while (k < n) {
      val lo = buf(H + 2 * idx(k)); val hi = buf(H + 1 + 2 * idx(k))
      if (lo <= curHi) { if (hi > curHi) curHi = hi }
      else { out += curLo; out += curHi; curLo = lo; curHi = hi }
      k += 1
    }
    out += curLo; out += curHi
    val arr = out.toArray
    arr(0) = (arr.length - H).toLong
    arr(1) = arr(0) // watermark = size at this compaction
    arr
  }

  private def emit(lo: Long, hi: Long, out: ArrayBuffer[Long]): Unit = {
    var pos = lo
    while (pos < hi) {
      var l = 0
      while (l < Sid.MaxLevel && ((pos & (Sid.increment(l) - 1L)) != 0L || pos + Sid.increment(l) > hi)) l += 1
      out += (pos | l)
      pos += Sid.increment(l)
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExplicitEncoders.longArray
  override def outputEncoder: Encoder[Array[Long]] = ExplicitEncoders.longArray

  lazy val asUdaf = udaf(DissolveAgg)
  def apply(sids: Column): Column = asUdaf(sids)
}

object ExplicitEncoders {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  implicit val longArray: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  implicit val longScalar: Encoder[Long] = Encoders.scalaLong
}

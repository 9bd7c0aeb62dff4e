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
  * Buffer = flat Array[Long] of merged, sorted [lo, hi) interval pairs.
  */
object DissolveAgg extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], sids: Array[Long]): Array[Long] = {
    if (sids == null || sids.isEmpty) return buf
    val add = Sid.mergedIntervals(sids)
    val flat = new Array[Long](add.length * 2)
    var i = 0
    while (i < add.length) { flat(2 * i) = add(i)._1; flat(2 * i + 1) = add(i)._2; i += 1 }
    mergeRuns(buf, flat)
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = mergeRuns(a, b)

  override def finish(buf: Array[Long]): Array[Long] = {
    val out = new ArrayBuffer[Long]()
    var i = 0
    while (i < buf.length) {
      emit(buf(i), buf(i + 1), out)
      i += 2
    }
    out.toArray
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

  /** merge two sorted flat interval arrays into one merged sorted array. */
  private def mergeRuns(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new ArrayBuffer[Long](a.length + b.length)
    var ia = 0; var ib = 0
    var curLo = Long.MinValue; var curHi = Long.MinValue
    var started = false
    while (ia < a.length || ib < b.length) {
      val takeA = ib >= b.length || (ia < a.length && a(ia) <= b(ib))
      val (lo, hi) = if (takeA) { val r = (a(ia), a(ia + 1)); ia += 2; r } else { val r = (b(ib), b(ib + 1)); ib += 2; r }
      if (!started) { curLo = lo; curHi = hi; started = true }
      else if (lo <= curHi) { if (hi > curHi) curHi = hi }
      else { out += curLo; out += curHi; curLo = lo; curHi = hi }
    }
    if (started) { out += curLo; out += curHi }
    out.toArray
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

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Cover, Htm, Sid}
import graft.functions.{DissolveAgg, StareFunctions}
import graft.functions.StareFunctions._

/** STARE dissolve: group-by + SID-set union/compression + attribute
  * aggregation (reference staredataframe.py:841-906). One shuffle, exact
  * partial aggregation (interval union is associative/commutative). */
object Dissolve {
  /** aggFuncs: other columns -> "first" | "sum" | "mean". */
  def apply(df: DataFrame, by: String, sidsCol: String = "sids",
            aggFuncs: Map[String, String] = Map.empty): DataFrame = {
    val aggs = DissolveAgg(col(sidsCol)).as(sidsCol) +:
      aggFuncs.toSeq.map { case (c, f) =>
        (f match {
          case "first" => first(col(c))
          case "sum"   => sum(col(c))
          case "mean"  => avg(col(c))
          case other   => throw new IllegalArgumentException(s"aggfunc $other")
        }).as(c)
      }
    df.groupBy(col(by)).agg(aggs.head, aggs.tail: _*)
  }

  /** whole-frame dissolve (by=None in the reference): one global cover. */
  def all(df: DataFrame, sidsCol: String = "sids"): Array[Long] =
    df.agg(DissolveAgg(col(sidsCol)).as("c")).collect()(0).getSeq[Long](0).toArray
}

/** speedy_subset (spatial_conversions.py:557-600): cheap range pre-filter
  * that reaches parquet zone maps, then an exact intersects filter. The
  * reference's distinct+semi-join dance exists to amortize vectorized C
  * calls; in Spark the per-row interval test is already a cheap codegen'd
  * call, so bounds-prune + exact test is the faster plan. */
object SpeedySubset {
  def apply(df: DataFrame, sidCol: String, cover: Array[Long]): DataFrame = {
    df.filter(stareCoverBoundsFilter(col(sidCol), cover))
      .filter(stareIntersectsCover(col(sidCol), cover))
  }
}

/** Edge conversion: dataframe with (x, y, value) columns -> dense 2-D
  * grid via groupBy(x).pivot(y) (reference to_array / to_sids_array,
  * staredataframe.py:1303-1383 — a collect-side reshape there; here the
  * pivot is distributed and only the final matrix is driver-side). */
object ToArray {
  def apply(df: DataFrame, xCol: String, yCol: String, valueCol: String): Array[Array[Double]] = {
    val yVals = df.select(col(yCol)).distinct().orderBy(col(yCol)).collect().map(_.get(0).toString)
    val pivoted = df.groupBy(col(xCol)).pivot(yCol).agg(first(col(valueCol))).orderBy(col(xCol))
    pivoted.collect().map(r => yVals.indices.map(i => Option(r.get(i + 1)).map(_.toString.toDouble).getOrElse(Double.NaN)).toArray)
  }
}

/** kNN via STARE cell-ring expansion: candidate pairs from a circular
  * cover around each query, exact great-circle distance, per-query top-k.
  * The reference only ships the circular-cover primitive
  * (spatial_conversions.py:508-554, make_circular_sids); ring-expansion
  * kNN semantics are ours (documented: grow the cap by doubling until
  * every query has >= k candidates, bounded rounds). */
object KnnJoin {

  private val distUdf = udf((sid1: Long, sid2: Long) => {
    val (la1, lo1) = Htm.sidToCenter(sid1)
    val (la2, lo2) = Htm.sidToCenter(sid2)
    haversineDeg(la1, lo1, la2, lo2)
  })

  def haversineDeg(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dp = p2 - p1; val dl = math.toRadians(lon2 - lon1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2 * math.asin(math.min(1.0, math.sqrt(a))) // radians on unit sphere
  }

  /** For each left row (scalar sid, id column) find k nearest right rows
    * (scalar sid). Both frames keep their payload columns; output =
    * left columns + right columns (suffixed `_nn`) + `dist_rad` + `nn_rank`.
    *
    * maxRounds caps the doubling; queries still short of k neighbors
    * after the last round return what was found (documented divergence
    * from an exact-but-unbounded search). */
  def apply(left: DataFrame, leftSid: String, right: DataFrame, rightSid: String,
            k: Int, initialDiameterDeg: Double = 1.0, coverLevel: Int = 9,
            maxRounds: Int = 4): DataFrame = {

    val rightKeyed = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, c + "_nn"))
    val rSid = rightSid + "_nn"

    // per-round frames are persisted: the rounds are defined recursively
    // (remaining_r depends on complete_{r-1}), so without persistence the
    // final union re-executes every earlier round's candidate join.
    var remaining = left.persist()
    var remainingCount = remaining.count()
    var results: Option[DataFrame] = None
    var diameter = initialDiameterDeg
    var round = 0
    while (round < maxRounds && remainingCount > 0) {
      // keep the per-query cover at ~constant cell count: each doubling
      // of the cap diameter drops the cover level by one
      val lvl = math.max(2, coverLevel - round)
      val candidates = candidateJoin(remaining, leftSid, rightKeyed, rSid, diameter, lvl)
        .withColumn("dist_rad", distUdf(col(leftSid), col(rSid)))
        // only trust neighbors provably inside the search cap: k-th
        // neighbor must be closer than the cap radius, else regrow
        .withColumn("nn_rank", row_number().over(
          Window.partitionBy(col(leftSid)).orderBy(col("dist_rad"))))
        .filter(col("nn_rank") <= k)
      val capRad = math.toRadians(diameter / 2)
      val isLast = round == maxRounds - 1
      val complete = (
        if (isLast) candidates
        else candidates.withColumn("__kth", max(when(col("nn_rank") === k, col("dist_rad")))
            .over(Window.partitionBy(col(leftSid))))
          .filter(col("__kth").isNotNull && col("__kth") < capRad)
          .drop("__kth")
        ).persist()
      results = Some(results.map(_.unionByName(complete)).getOrElse(complete))
      if (!isLast) {
        val done = complete.select(col(leftSid)).distinct()
        val next = remaining.join(done, Seq(leftSid), "left_anti").persist()
        remainingCount = next.count()
        remaining = next
      }
      diameter *= 2
      round += 1
    }
    results.get
  }

  private def candidateJoin(left: DataFrame, leftSid: String, right: DataFrame, rSid: String,
                            diameterDeg: Double, coverLevel: Int): DataFrame = {
    val withCover = left.withColumn("__cov",
      StareFunctions.stareCircularCover(col(leftSid), lit(diameterDeg), coverLevel))
    val exploded = withCover.withColumn("__cs", explode(col("__cov"))).drop("__cov")
    // prefix keys of right points at the cover levels (boundary at
    // coverLevel, interior coarser)
    val levels = (0 to coverLevel).toArray
    val rightKeys = right.withColumn("__rk", explode(
      filter(array(levels.map(l => when(stareLevel(col(rSid)) >= l, stareClearTo(col(rSid), l))): _*),
        c => c.isNotNull)))
    // no dedup needed: a multi-res cover's trixels are disjoint, so each
    // right point matches at most one cover sid per query
    exploded.withColumn("__lk", stareClearToOwn(col("__cs")))
      .join(rightKeys, col("__lk") === col("__rk"))
      .drop("__cs", "__lk", "__rk")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.Sid
import graft.operators.{Skew, StareJoin}

/** Three-way join-equivalence fuzz (r4 verdict item 1): the join family's
  * safety conditions — dictionary soundness, rebase caps, split gates,
  * gated key derivation — are individually regression-tested; this suite
  * fuzzes them JOINTLY over random mixed-level covers × random point/cover
  * level mixes × how ∈ {inner, left}, asserting
  *
  *   pointJoin ≡ Skew.shuffleJoin ≡ brute-force contains
  *   StareJoin.join ≡ brute-force intersects  (both directions)
  *
  * against the tiny interval reference (core/Sid.scala:58-61). Pair sets
  * are compared as exact sorted multisets of (left id, right name), so
  * duplicated pairs fail as loudly as missing ones.
  *
  * Reference contract: tools/stare_join.py:4-63 (pair semantics),
  * tests/test_join.py:77-81 (column order — covered by SparkOpsSpec).
  *
  * Semantics note: pointJoin/shuffleJoin implement the cover-contains-
  * point direction over PER-ROW COMPRESSED covers (both plans compress
  * before keying — four siblings merge into their parent, which can
  * contain a left sid at the parent's level that no raw sibling
  * contains), so the brute reference compresses too. StareJoin.join is
  * interval-intersects in either direction, which is invariant under
  * compression — its reference uses the raw cells.
  */
class JoinEquivalenceFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---------------------------------------------------------- generators

  /** random sid from raw bits: random face, random child path to `lvl`. */
  private def randomSid(r: scala.util.Random, lvl: Int): Long = {
    var loc = r.nextInt(8).toLong << 59
    var i = 1
    while (i <= lvl) { loc |= r.nextInt(4).toLong << (59 - 2 * i); i += 1 }
    loc | lvl
  }

  /** random level-`lvl` descendant of `cell` (lvl >= level(cell)). */
  private def descendantOf(r: scala.util.Random, cell: Long, lvl: Int): Long = {
    var loc = Sid.intervalLo(cell)
    var i = Sid.level(cell) + 1
    while (i <= lvl) { loc |= r.nextInt(4).toLong << (59 - 2 * i); i += 1 }
    loc | lvl
  }

  private def ancestorOf(cell: Long, lvl: Int): Long = (cell & Sid.clearMask(lvl)) | lvl

  /** covers: first row always non-empty; later rows may be empty (an
    * empty cover row must join nothing and, for how=left, contribute no
    * false unmatched rows either). */
  private def randomCovers(r: scala.util.Random): Seq[(String, Seq[Long])] = {
    val n = 2 + r.nextInt(4)
    (0 until n).map { i =>
      val cells = if (i == 0) 1 + r.nextInt(4) else r.nextInt(5)
      (s"c$i", Seq.fill(cells)(randomSid(r, 1 + r.nextInt(8))))
    }
  }

  /** left points biased toward the cover cells (equal / descendant /
    * strict ancestor) so matches, near-misses and the merged-sibling
    * containment case all occur; the rest are uniform mixed-level sids. */
  private def randomLeft(r: scala.util.Random, covers: Seq[(String, Seq[Long])],
                         n: Int): Seq[(Long, Long)] = {
    val cells = covers.flatMap(_._2)
    (0 until n).map { i =>
      val sid =
        if (cells.nonEmpty && r.nextBoolean()) {
          val cell = cells(r.nextInt(cells.size))
          val cl = Sid.level(cell)
          r.nextInt(3) match {
            case 0 => cell
            case 1 => descendantOf(r, cell, math.min(27, cl + 1 + r.nextInt(8)))
            case _ => ancestorOf(cell, r.nextInt(cl + 1))
          }
        } else randomSid(r, r.nextInt(15))
      (i.toLong, sid)
    }
  }

  // ---------------------------------------------------------- references

  /** contains direction over the compressed cover (pointJoin/shuffleJoin
    * contract). */
  private def coverContains(cover: Seq[Long], sid: Long): Boolean = {
    val comp = Sid.compress(cover.toArray)
    comp.exists(c => Sid.level(c) <= Sid.level(sid) && Sid.intersects(c, sid))
  }

  /** intersects in either direction over the raw cells (join() contract). */
  private def coversIntersect(a: Seq[Long], b: Seq[Long]): Boolean =
    a.nonEmpty && b.nonEmpty &&
      Sid.anyIntersects(a.toArray, Sid.mergedIntervals(b.toArray))

  private def expectedPairs(left: Seq[(Long, Long)], covers: Seq[(String, Seq[Long])],
                            how: String, matches: (Seq[Long], Long) => Boolean): Seq[(Long, String)] = {
    val inner = for {
      (lid, sid) <- left
      (name, cover) <- covers
      if matches(cover, sid)
    } yield (lid, name)
    val out =
      if (how == "inner") inner
      else {
        val matched = inner.map(_._1).toSet
        inner ++ left.collect { case (lid, _) if !matched(lid) => (lid, "__none") }
      }
    out.sorted
  }

  private def observedPairs(df: DataFrame): Seq[(Long, String)] =
    df.select(col("lid"), col("rname")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) "__none" else r.getString(1)))
      .toSeq.sorted

  // ---------------------------------------------------------- the fuzz

  test("pointJoin ≡ shuffleJoin ≡ brute contains; join() ≡ brute intersects (15 random trials × inner/left)") {
    import spark.implicits._
    val r = new scala.util.Random(20260817)
    (1 to 15).foreach { trial =>
      val covers = randomCovers(r)
      val left = randomLeft(r, covers, 8 + r.nextInt(25))
      val leftDf = left.toDF("lid", "sid")
      val rightDf = covers.toDF("rname", "sids")
      // multi-sid left arrays for the cover×cover general join
      val leftArr = left.map { case (lid, sid) =>
        val extra = Seq.fill(r.nextInt(3))(randomSid(r, r.nextInt(12)))
        (lid, sid +: extra)
      }
      val leftArrDf = leftArr.toDF("lid", "sids_l")

      Seq("inner", "left").foreach { how =>
        val clue = s"trial=$trial how=$how covers=$covers left=$left"
        val expContains = expectedPairs(left, covers, how, coverContains)
        val point = observedPairs(
          StareJoin.pointJoin(leftDf, "sid", rightDf, "sids", how = how))
        assert(point === expContains, s"pointJoin vs brute — $clue")
        val shuffle = observedPairs(
          Skew.shuffleJoin(leftDf, "sid", rightDf, "sids", splitHot = None, how = how))
        assert(shuffle === expContains, s"shuffleJoin vs brute — $clue")

        // join() reference over the FULL left arrays (expectedPairs takes
        // a scalar sid, so build this pair set directly)
        val innerPairs = for {
          (lid, sids) <- leftArr
          (name, cover) <- covers
          if coversIntersect(sids, cover)
        } yield (lid, name)
        val expJoin =
          (if (how == "inner") innerPairs
           else {
             val m = innerPairs.map(_._1).toSet
             innerPairs ++ leftArr.collect { case (lid, _) if !m(lid) => (lid, "__none") }
           }).sorted
        // both join() paths: the driver-local small-sides fast path
        // (default cap) and the distributed plan (cap=0) — r6
        val general = observedPairs(
          StareJoin.join(leftArrDf, "sids_l", rightDf, "sids", how = how))
        assert(general === expJoin, s"join() [local path] vs brute intersects — $clue")
        spark.conf.set("spark.graft.join.localCoverCap", "0")
        val generalDist =
          try observedPairs(StareJoin.join(leftArrDf, "sids_l", rightDf, "sids", how = how))
          finally spark.conf.unset("spark.graft.join.localCoverCap")
        assert(generalDist === expJoin, s"join() [distributed path] vs brute intersects — $clue")
      }
    }
  }

  test("forced hot-cell split join ≡ unsplit ≡ brute (engineered skew, 2 trials × inner/left)") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    val priorBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // no broadcast: the splitter only engages when a per-key shuffle exists
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1 to 3).foreach { trial =>
        val hot = randomSid(r, 2 + r.nextInt(3)) // one hot cover cell
        val hotLevel = Sid.level(hot)
        // trial 3: an ANCESTOR cover cell overlapping the hot cell —
        // pins the r6 dead-base-key suppression's overlap safety (rows
        // in the split parent must still match the blanket cover; an
        // unconditional suppression would lose those pairs)
        val blanket =
          if (trial == 3 && hotLevel > 0)
            Seq(("blanket", Seq((hot & Sid.clearMask(hotLevel - 1)) | (hotLevel - 1).toLong)))
          else Seq.empty
        val covers = Seq(
          ("hot", Seq(hot, randomSid(r, 6))),
          ("cold", Seq(randomSid(r, 3), randomSid(r, 5)))) ++ blanket
        // 4000 points inside the hot cell at mixed fine levels + 1000
        // uniform: the 1% sample sees ~40 hot rows, estHot ~4000 ≫ the
        // 2× fair-share gate at 4 shuffle partitions
        val left = ((0 until 4000).map { i =>
          (i.toLong, descendantOf(r, hot, math.min(27, hotLevel + 2 + r.nextInt(10))))
        } ++ (4000 until 5000).map { i =>
          (i.toLong, randomSid(r, 4 + r.nextInt(10)))
        })
        val leftDf = left.toDF("lid", "sid")
        val rightDf = covers.toDF("rname", "sids")
        // prove the fuzz exercises the split machinery, not the skip path
        val spec = Skew.splitHotCellsWithSpec(leftDf, "sid", rightDf, "sids",
          maxRowsPerCell = 100, sampleFraction = 1.0, wallClockGate = false)
        assert(spec.skipReason.isEmpty && spec.parents.nonEmpty,
          s"engineered skew did not engage the splitter: ${spec.skipReason}")
        Seq("inner", "left").foreach { how =>
          val exp = expectedPairs(left, covers, how, coverContains)
          val split = observedPairs(Skew.shuffleJoin(leftDf, "sid", rightDf, "sids",
            splitHot = Some(100L), how = how, wallClockGate = false))
          assert(split === exp, s"split shuffleJoin vs brute — trial=$trial how=$how hot=$hot")
          val unsplit = observedPairs(Skew.shuffleJoin(leftDf, "sid", rightDf, "sids",
            splitHot = None, how = how))
          assert(unsplit === exp, s"unsplit shuffleJoin vs brute — trial=$trial how=$how hot=$hot")
        }
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBcast)
  }

  test("single-level-cover LEFT shuffleJoin takes the direct-join path and stays exact (r6)") {
    // Pins the r6 single-candidate-key rewrite of shuffleJoin's left
    // branch (one uniform cover level -> direct left equi-join, no
    // pair/join-back): adversarial fixture with an unmatched fine point,
    // a TOO-COARSE left sid (derives no key -> must surface as __none,
    // not vanish), overlapping covers (multi-match multiplicity), an
    // empty-cover right row, and duplicate pre-compress cells.
    import spark.implicits._
    val r = new scala.util.Random(20260822)
    val cellA = randomSid(r, 6)
    val cellB = randomSid(r, 6)
    val inA1 = descendantOf(r, cellA, 26)
    val inA2 = descendantOf(r, cellA, 26)
    val inB = descendantOf(r, cellB, 26)
    val outside = {
      var s = randomSid(r, 26)
      while (coverContains(Seq(cellA, cellB), s)) s = randomSid(r, 26)
      s
    }
    val coarse = randomSid(r, 3) // coarser than every cover cell: contract says no match
    val left = Seq((1L, inA1), (2L, inA2), (3L, inB), (4L, outside), (5L, coarse))
    val covers = Seq(
      ("a", Seq(cellA, cellA)),          // duplicate cell: compress, single match
      ("ab", Seq(cellA, cellB)),         // overlaps both populations
      ("empty", Seq.empty[Long]),        // never matches
      ("a2", Seq(cellA)))              // same cell again under a different row
    Seq("left", "inner").foreach { how =>
      val exp = expectedPairs(left, covers, how, coverContains)
      val got = observedPairs(Skew.shuffleJoin(left.toDF("lid", "sid"), "sid",
        covers.toDF("rname", "sids"), "sids", splitHot = None, how = how))
      assert(got === exp, s"how=$how covers=$covers left=$left")
      // same fixture through pointJoin for the three-way invariant
      val point = observedPairs(StareJoin.pointJoin(left.toDF("lid", "sid"), "sid",
        covers.toDF("rname", "sids"), "sids", how = how))
      assert(point === exp, s"pointJoin how=$how")
    }
  }
}

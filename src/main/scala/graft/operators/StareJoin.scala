package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Sid
import graft.functions.StareFunctions._

/** Distributed STARE spatial join (intersects predicate).
  *
  * Reference semantics (tools/stare_join.py:4-63): for each right row,
  * every left row whose SID set intersects the right row's SID set is
  * emitted; how='left' keeps unmatched left rows with null right
  * columns; clashing column names get _left/_right suffixes and a
  * key_right column carries the right row id.
  *
  * Spark-first plan — NOT the reference's O(L×R) nested loop: trixel
  * intervals are aligned quadtree ranges, so interval containment is an
  * EQUI-join on the cleared-to-level prefix key:
  *
  *     sid_a ⊇ sid_b  ⟺  clearTo(b, level(a)) == normalize(a)
  *
  * We explode the right covers (one row per cover sid, keyed by its
  * normalized sid), collect the small set of distinct cover levels, and
  * explode each left sid into one ancestor key per cover level. The
  * result is a plain hash/broadcast equi-join: Catalyst broadcasts the
  * (small) exploded cover side, AQE handles skew on the shuffle path,
  * and no custom physical operator is needed. The reverse containment
  * direction (left sid coarser than a right cover sid) is the mirrored
  * prefix join; pairs are deduplicated before row assembly.
  */
object StareJoin {

  private final val LKey = "__stare_lkey"
  private final val RKey = "__stare_rkey"

  /** Bijective low-bit mix applied to BOTH sides of every sid-derived
    * long equi-join key (r6, the single largest headline-join cost):
    * Spark's LongToUnsafeRowMap slots a key by
    * ((key * 0x9E3779B9) ^ (product >> 32)) & mask — a 32-bit golden
    * multiply. A cover-level key is (locationPrefix << (5 + 2*(27-L)))
    * | L: at L=6 the low 47 bits are IDENTICAL across every key, so the
    * product's low 32 bits are constant and the varying bits land at
    * positions 15-31 — masked out for any map under ~4B slots. Every
    * level-6 cover cell therefore hashed into ONE linear-probe cluster,
    * and each of the 16M bench probes walked a ~7k-entry chain:
    * measured 160 core-seconds (~10 core-µs/row) against 0.28 s for an
    * equal-cardinality dense-key join; fixed, the probe is ~40x cheaper
    * (joinlab in BenchExtra).
    *
    * key ^ (key >>> 31) is invertible (xorshift), null-preserving, and
    * moves every cover level's meaningful bits (positions 5..61) into
    * the golden multiply's low 32 bits, so equality — and hence the
    * join's match set — is EXACTLY preserved while slots spread. Row-id
    * join-backs (packed partition<<40|pos ids) already vary in their
    * low bits and stay unmixed. */
  private[operators] def mixKey(c: Column): Column =
    c.bitwiseXOR(shiftrightunsigned(c, 31))

  /** normalized key of a sid at its own (statically known) level. */
  private def normKey(sid: Column, level: Int): Column = stareClearTo(sid, level)

  /** ancestor keys of a sid for the given candidate levels, keeping only
    * levels at or above the sid's own level. With a known minimum sid
    * level, levels at or below it need no per-row guard. */
  private def ancestorKeys(sid: Column, levels: Array[Int],
                           knownMinLevel: Option[Int] = None): Column = {
    val ml = knownMinLevel.getOrElse(-1)
    val guarded = levels.map { l =>
      if (l <= ml) stareClearTo(sid, l)
      else when(stareLevel(sid) >= l, stareClearTo(sid, l))
    }
    if (levels.forall(_ <= ml)) array(guarded: _*)
    else filter(array(guarded: _*), c => c.isNotNull)
  }

  /** Point-left fast path: left has a scalar sid column (points at a
    * fine level), right has an array cover column. Returns the joined
    * frame with all left columns, `key_right`, and right columns
    * (clashes suffixed). This is the 100TB-shape join: the big point
    * side is never exploded more than |cover levels| times and the
    * cover side broadcasts.
    *
    * PRECONDITION (both plans): left sids must be at least as fine as
    * the cover cells they should match — only the cover-contains-point
    * direction is implemented. A left sid COARSER than a cover cell
    * derives no key at that cell's level and never matches (use join()
    * for cover-vs-cover semantics). Fine-level point tables (level
    * 26/27) vs polygon covers (level <= ~12) always satisfy this.
    *
    * `knownMinLeftLevel`: callers that KNOW their minimum left sid
    * level (e.g. a table indexed at level 26) pass it so the per-row
    * level guard constant-folds away. This matters when the sid column
    * is itself an unevaluated encode expression: projection collapse
    * otherwise re-inlines the encode into the guard and the pushed
    * null-check, evaluating the kernel up to 3x per row (measured ~2x
    * headline join throughput). */
  def pointJoin(left: DataFrame, leftSid: String, right: DataFrame, rightSids: String,
                how: String = "left", knownMinLeftLevel: Option[Int] = None,
                maxBroadcastRows: Int = 1 << 20): DataFrame = {
    // Guard the by-design assumption instead of trusting the caller: the
    // cover side is about to be collect()ed to the driver. One SMALL
    // probe collect answers the common case (covers of a few rows)
    // outright AND doubles as the byte-width sample; bigger sides pay
    // one count plus a byte estimate before the full collect. A
    // row-count-only guard would still OOM on count-compliant frames
    // with fat payload rows. The right frame is persisted ACROSS the
    // guard so probe + count + collect evaluate each partition of the
    // right plan at most ~once (r3 verdict item 8: the un-cached guard
    // scheduled up to 3 full evaluations for 1000..1M-row covers); the
    // cache is dropped before returning on every path. The byte cap
    // applies on the small-probe branch too — a handful of very fat
    // rows (huge text/sid payloads) must not reach the driver either.
    // Over either cap we delegate to the shuffle-path join, which
    // shares the output contract.
    val spark = left.sparkSession
    val probeCap = math.min(1000, maxBroadcastRows)
    val maxBroadcastBytes = 512L * 1024 * 1024
    // persist only when the caller hasn't: an unconditional persist +
    // unpersist would silently DROP a caller's own cache (KnnJoin
    // persists its reusable sides across rounds)
    val weCached = right.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (weCached) right.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val collected: Array[org.apache.spark.sql.Row] =
      try {
        val probe = right.limit(probeCap + 1).collect()
        if (probe.length <= probeCap) {
          if (approxRowBytes(probe) * probe.length > maxBroadcastBytes)
            return Skew.shuffleJoin(left, leftSid, right, rightSids, splitHot = None,
              how = how, knownMinLeftLevel = knownMinLeftLevel)
          probe
        } else {
          val n = right.count()
          if (n > maxBroadcastRows || approxRowBytes(probe) * n > maxBroadcastBytes)
            return Skew.shuffleJoin(left, leftSid, right, rightSids, splitHot = None,
              how = how, knownMinLeftLevel = knownMinLeftLevel)
          right.collect()
        }
      } finally if (weCached) right.unpersist(false)
    // The cover side fits in a broadcast, so assign row ids
    // on the driver: deterministic across every reuse of the frame (no
    // monotonically_increasing_id re-evaluation hazard) and no lingering
    // persist() that pressures the executor cache across queries.
    val rightRows = {
      val schema = org.apache.spark.sql.types.StructType(
        right.schema.fields :+ org.apache.spark.sql.types.StructField("key_right", org.apache.spark.sql.types.LongType, nullable = false))
      val rows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(collected.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i.toLong)
        }: _*)
      spark.createDataFrame(rows, schema)
    }
    // compress each cover first: canonical covers are non-nested, so a
    // point matches at most one cover sid per right row — no pair dedup
    // (and hence no join-back on a big-side row id) is ever needed.
    val rightKeyed = rightRows
      .withColumn("__cs", stareCompress(col(rightSids)))
      .select(col("key_right").as("__rid"), explode(col("__cs")).as("__rs"))
      .withColumn(RKey, stareClearToOwn(col("__rs")))
      .select(col("__rid"), col(RKey))

    // cover cells per collected row, computed ONCE on the driver: they
    // feed the key set, the level set, and the per-ROW expansion budget
    // (a Spark distinct() job here re-evaluated the cover side again)
    val sidsIdx = right.schema.fieldIndex(rightSids)
    val perRowCells: Array[Array[Long]] = collected.map { r =>
      val s = r.getSeq[Long](sidsIdx)
      if (s == null) Array.emptyLongArray else Sid.compress(s.toArray)
    }
    val keySet = perRowCells.iterator.flatMap(_.iterator).map(Sid.clearToLevel).toSet
    if (keySet.isEmpty) {
      // every right cover is empty: inner -> no rows, left -> all-null
      // right columns (one row per left row)
      val joined = left.withColumn("__rid", lit(null).cast("long"))
      val base = if (how == "inner") joined.filter(lit(false)) else joined
      return assemble(base, rightRows, how, broadcastRight = true)
    }
    val levels = keySet.map(Sid.level).toArray.sorted

    // Uniform-level dictionary plan: if expanding every cover cell to the
    // finest cover level keeps the broadcast side small, each point needs
    // exactly ONE cleared key — no explode, 1 probe/row instead of
    // |levels| probes/row. The multi-level explode plan moved 5x the rows
    // through the join and was memory-bandwidth-bound at high core
    // counts. Expansion is per right row over disjoint cells, so pair
    // multiplicity is unchanged.
    val maxLevel = levels.last
    // Expansion cost summed over ROWS, not distinct keys: both
    // dictionary plans explode the cover per right row, so duplicate
    // covers multiply the broadcast — a distinct-key budget admitted
    // 500k rows sharing one cell into a plan that would expand each of
    // them. Early exit once over budget (also prevents Long overflow on
    // extreme level spreads).
    val keyBudget = 4L * 1024 * 1024
    val expansionCost: Long = {
      var cost = 0L
      var i = 0
      while (i < perRowCells.length && cost <= keyBudget) {
        val cells = perRowCells(i)
        var j = 0
        while (j < cells.length && cost <= keyBudget) {
          cost += 1L << (2 * (maxLevel - Sid.level(cells(j)))); j += 1
        }
        i += 1
      }
      cost
    }
    // budgets: row-count cap (4M keys ~ 64 MB as bare (rid, key) pairs)
    // decides whether a uniform-level dictionary is viable at all; a
    // BYTE cap on expansionCost x measured-row-width decides whether the
    // dictionary can carry the full right rows (probe = the only pass
    // over the big side) or only (rid, key) pairs + a re-join — a fat
    // cover side (wide payload columns, big sid arrays) duplicated per
    // expanded cell would otherwise build a multi-GB broadcast.
    val rowBytes = approxRowBytes(collected)
    val fullRowDictBytes = expansionCost * rowBytes
    // A uniform-level dictionary probes every left row at exactly ONE
    // level, so it is only SOUND when every left sid is at least as
    // fine as the finest cover cell: a left row with level in
    // [cellLevel, maxLevel) is contained by a coarse cell but would
    // derive no key at maxLevel and silently lose that match (the same
    // hazard ADVICE r3 flagged on the shuffle path's rebase). A
    // single-level cover needs no check — a row coarser than the only
    // level is matchless under the containment contract and its null
    // key is exact. Otherwise the declared min left level decides, or —
    // when the caller declared nothing — one narrow column-pruned agg
    // job over the left sid column does. Mixed-level lefts fall through
    // to the per-level-guarded explode plan, which is exact for any mix.
    val dictSafe = expansionCost <= keyBudget &&
      (levels.length <= 1 || knownMinLeftLevel.map(_ >= maxLevel).getOrElse {
        left.agg(min(stareLevel(col(leftSid)))).collect()(0) match {
          case r if r.isNullAt(0) => true
          case r                  => r.getLong(0) >= maxLevel
        }
      })
    if (dictSafe && fullRowDictBytes <= 256L * 1024 * 1024) {
      // The dictionary carries the right ROW COLUMNS directly (suffixed
      // up front), so the probe is the ONLY pass over the big side —
      // routing just row ids and re-joining in assemble() cost a second
      // full broadcast-probe over every left row.
      val leftCols = left.columns
      val rightCols = rightRows.columns.filter(_ != "key_right")
      val clash = leftCols.toSet.intersect(rightCols.toSet)
      val l = clash.foldLeft(left)((df, c) => df.withColumnRenamed(c, c + "_left"))
      val r = clash.foldLeft(rightRows)((df, c) => df.withColumnRenamed(c, c + "_right"))
      val leftSidCol = if (clash.contains(leftSid)) leftSid + "_left" else leftSid
      val rightSidsCol = if (clash.contains(rightSids)) rightSids + "_right" else rightSids
      val expandAll = udf((sids: Seq[Long]) => Sid.expandToLevel(sids.toArray, maxLevel))
      val rightUniform = r.withColumn(RKey, explode(expandAll(stareCompress(col(rightSidsCol)))))
      // precondition of this plan: left sids are at least as fine as the
      // finest cover cell (true for point tables at level 26/27 vs
      // polygon covers; coarser left sids should use join() instead).
      // Coarser rows get a null key => no match, never a wrong match.
      // With a known-fine left the guard drops at plan time (one encode
      // evaluation per row instead of three — see method doc).
      // knownMinLeftLevel also implies non-null sids (an indexed table),
      // so the key is marked KnownNotNull: without it the planner infers
      // an IsNotNull(key) filter that re-evaluates the key expression —
      // i.e. a second encode per row when sid is an unevaluated encode.
      val leftKeyed = knownMinLeftLevel match {
        case Some(ml) if ml >= maxLevel =>
          l.withColumn(LKey, graft.functions.NativeExpressions.knownNotNull(
            stareClearTo(col(leftSidCol), maxLevel)))
        case _ => l.withColumn(LKey,
          when(stareLevel(col(leftSidCol)) >= maxLevel, stareClearTo(col(leftSidCol), maxLevel)))
      }
      val joinType = if (how == "inner") "inner" else "left"
      // NOTE: for how='left' a point matching nothing keeps one row with
      // all-null right columns — exactly stare_join's left semantics, no
      // key filter needed because there is a single key per row.
      val out = leftKeyed
        .join(broadcast(rightUniform), mixKey(col(LKey)) === mixKey(col(RKey)), joinType)
        .drop(LKey, RKey)
      // column order: left columns, key_right, right columns (test_join.py:77-81)
      val ordered = l.columns.filter(c => c != LKey).map(out(_)) ++
        Array(out("key_right")) ++ r.columns.filter(_ != "key_right").map(out(_))
      return out.select(ordered.toIndexedSeq: _*)
    }
    if (dictSafe) {
      // Slim dictionary: same single-probe key plan, but the broadcast
      // carries only (rid, key) pairs; the right row columns re-attach in
      // assemble() via a second (cheap — the dictionary already filtered)
      // broadcast join. Chosen when the full-row dictionary would blow
      // the byte budget (fat right rows x expansion).
      val expandAll = udf((sids: Seq[Long]) => Sid.expandToLevel(sids.toArray, maxLevel))
      val slim = rightRows.select(col("key_right").as("__rid"),
        explode(expandAll(stareCompress(col(rightSids)))).as(RKey))
      val leftKeyed = knownMinLeftLevel match {
        case Some(ml) if ml >= maxLevel =>
          left.withColumn(LKey, graft.functions.NativeExpressions.knownNotNull(
            stareClearTo(col(leftSid), maxLevel)))
        case _ => left.withColumn(LKey,
          when(stareLevel(col(leftSid)) >= maxLevel, stareClearTo(col(leftSid), maxLevel)))
      }
      val joinType = if (how == "inner") "inner" else "left"
      val joined = leftKeyed.join(broadcast(slim), mixKey(col(LKey)) === mixKey(col(RKey)), joinType)
        .drop(LKey, RKey)
      return assemble(joined, rightRows, how, broadcastRight = true)
    }

    val joined = if (how == "inner") {
      // hot path: pure-native explode of the ancestor keys (one CASE+bit
      // op per cover level, whole-stage codegen, zero allocation) and an
      // inner hash probe — unmatched keys simply drop out. |levels| is
      // small (compressed covers), so the explode factor is bounded.
      val leftKeyed = left.withColumn(LKey,
        explode(ancestorKeys(col(leftSid), levels, knownMinLeftLevel)))
      leftKeyed.join(broadcast(rightKeyed), mixKey(col(LKey)) === mixKey(col(RKey)), "inner")
        .drop(LKey, RKey)
    } else {
      // left join: pre-filter each point's ancestor keys to those that
      // exist on the right (the cover side is broadcast anyway, so its
      // key set fits on the driver). Every surviving key matches >= 1
      // right row, and a row with no surviving key explodes to a single
      // null key — exact stare_join multiplicity with no row id,
      // join-back, or window pass over the big side.
      val filterKeys = udf((ks: Seq[Long]) => { val f = ks.filter(keySet); if (f.isEmpty) null else f })
      val leftKeyed = left.withColumn(LKey,
        explode_outer(filterKeys(ancestorKeys(col(leftSid), levels, knownMinLeftLevel))))
      leftKeyed.join(broadcast(rightKeyed), mixKey(col(LKey)) === mixKey(col(RKey)), "left")
        .drop(LKey, RKey)
    }

    assemble(joined, rightRows, how, broadcastRight = true)
  }

  /** Rough in-memory width of a collected row (bytes) — drives the
    * dictionary-plan byte budget. Samples <= ~100 rows evenly. */
  private[operators] def approxRowBytes(rows: Array[org.apache.spark.sql.Row]): Long = {
    if (rows.isEmpty) return 16L
    def sz(v: Any): Long = v match {
      case null          => 8L
      case s: String     => 40L + 2L * s.length
      case a: Seq[_]     => 40L + a.iterator.map(sz).sum
      case a: Array[_]   => 40L + a.iterator.map(sz).sum
      case m: Map[_, _]  => 48L + m.iterator.map { case (k, w) => sz(k) + sz(w) }.sum
      case r: org.apache.spark.sql.Row => 16L + r.toSeq.iterator.map(sz).sum
      case _             => 8L
    }
    val step = math.max(1, rows.length / 100)
    val sampled = rows.indices.by(step).map(rows(_))
    math.max(16L, sampled.iterator.map(r => 16L + r.toSeq.iterator.map(sz).sum).sum / sampled.length)
  }

  /** Stable, deterministic row ids, packed (partition << 40 | pos):
    * unlike monotonically_increasing_id (whose values can change if a
    * cached frame is recomputed under a different physical layout) the
    * assignment is a pure function of the partitioned input lineage, so
    * the frame can be reused across joins with NO persist — cache
    * hygiene with correctness intact. Unlike content-hash ids there are
    * no birthday collisions (~rows²/2^65 silently merged row identities
    * at 10^12 rows, i.e. wrong join multiplicity).
    *
    * Round-4 rework (r3 verdict item 1): the previous rdd.zipWithIndex
    * ran one extra Spark job (partition counts) that re-evaluated the
    * whole upstream plan, plus an InternalRow->Row->InternalRow round
    * trip; the packed id needs ZERO extra jobs and stays on
    * InternalRows (shim.withPackedIdColumn). Ids are unique and stable
    * but not contiguous — no caller depends on contiguity.
    *
    * Order stabilization (ADVICE r5): packed ids are a function of
    * intra-partition row ORDER, which an exchange-bearing lineage does
    * not guarantee across the two subtrees that evaluate the id frame
    * (pair derivation + join-back). When the optimized plan carries an
    * exchange, rows are first sorted WITHIN partitions by every
    * orderable column — no extra shuffle, no cache, and the id becomes
    * a pure function of partition CONTENT (hash partitioning fixes
    * content; only arrival order was unstable). Scan/narrow/cached
    * lineages — every hot bench path — skip the sort entirely. */
  private[operators] def withStableId(df: DataFrame, name: String): DataFrame = {
    val shim = org.apache.spark.sql.graft.shim
    val stabilized =
      if (!shim.hasOrderHazard(df)) df
      else {
        val orderable = df.schema.fields.filter(f => shim.isOrderable(f.dataType))
          .map(f => col(f.name))
        if (orderable.nonEmpty) df.sortWithinPartitions(orderable.toIndexedSeq: _*)
        else {
          // nothing to sort by (every column non-orderable, e.g. all
          // maps): fall back to persisting the frame, so both subtrees
          // of the consuming join read ONE materialization — block-level
          // locking means each partition is computed once and the id is
          // assigned on that single computation. The pin is deliberate
          // and logged; silently proceeding risked mismatched ids.
          System.err.println(
            s"[stare_join] withStableId($name): exchange-bearing lineage with no orderable " +
              "columns — persisting the id frame to pin row order (cache not auto-released)")
          df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        }
      }
    shim.withPackedIdColumn(stabilized, name)
  }

  /** General cover-vs-cover join (both sides array covers).
    *
    * Fixed-cost budget (r3 verdict item 1): both sides' level sets come
    * from ONE combined job (not two collects), stable ids cost zero
    * extra jobs (withStableId), and the strictly-coarser direction B —
    * with its join + filter subplan — is built only when some left
    * level is actually coarser than the finest right level. */
  def join(left: DataFrame, leftSids: String, right: DataFrame, rightSids: String,
           how: String = "left"): DataFrame = {
    // Small-sides fast path (r6, guide §1.2): both sides of a general
    // cover×cover join pass through withStableId, whose RDD round-trip
    // erases size statistics — every downstream join then plans as a
    // SortMergeJoin cascade (measured: 20 Exchanges for an 8×8-row
    // join). When BOTH sides fit a driver probe, the exact pair set is
    // one interval-intersection loop (the fuzz suite's own reference
    // kernel) and the result a LocalRelation with known stats.
    // Conf-gated (spark.graft.join.localCoverCap, rows per side; 0
    // disables) so tests exercise both paths.
    val localCap = try left.sparkSession.conf
        .get("spark.graft.join.localCoverCap", "1024").toInt
      catch { case _: Exception => 1024 }
    if (localCap > 0) {
      val lp = left.limit(localCap + 1).collect()
      if (lp.length <= localCap) {
        val rp = right.limit(localCap + 1).collect()
        if (rp.length <= localCap &&
          approxRowBytes(lp) * lp.length + approxRowBytes(rp) * rp.length <=
            128L * 1024 * 1024)
          return localJoin(left.sparkSession, lp, left.schema, leftSids,
            rp, right.schema, rightSids, how)
      }
    }
    // both level sets in one tiny aggregation job
    val lv = left.select(lit(1).as("side"), explode(col(leftSids)).as("s"))
      .unionByName(right.select(lit(2).as("side"), explode(col(rightSids)).as("s")))
      .select(col("side"), stareLevel(col("s")).as("l"))
      .distinct().collect()
    val llevels = lv.filter(_.getInt(0) == 1).map(_.getLong(1).toInt).sorted
    val rlevels = lv.filter(_.getInt(0) == 2).map(_.getLong(1).toInt).sorted

    val leftIds = withStableId(left, "__lid")
    val rightIds = withStableId(right, "key_right")

    val le = leftIds.select(col("__lid"), explode(col(leftSids)).as("__ls"))
    val re = rightIds.select(col("key_right").as("__rid"), explode(col(rightSids)).as("__rs"))

    // direction A: right sid contains left sid (left key cleared to right levels)
    val a = le.withColumn(LKey, explode(ancestorKeys(col("__ls"), rlevels)))
      .join(re.withColumn(RKey, stareClearToOwn(col("__rs"))), mixKey(col(LKey)) === mixKey(col(RKey)))
      .select(col("__lid"), col("__rid"))
    // direction B: left sid contains right sid (strictly coarser to avoid
    // double-count); provably empty — and skipped wholesale — when no
    // left level is coarser than the finest right level
    val bLevels = if (rlevels.isEmpty) Array.empty[Int] else llevels.filter(l => l < rlevels.max)
    val ab = if (bLevels.isEmpty) a else {
      val b = re.withColumn(RKey, explode(ancestorKeys(col("__rs"), bLevels)))
        .join(le.withColumn(LKey, stareClearToOwn(col("__ls"))), mixKey(col(LKey)) === mixKey(col(RKey)))
        .filter(stareLevel(col("__ls")) < stareLevel(col("__rs")))
        .select(col("__lid"), col("__rid"))
      a.union(b)
    }

    val pairs = ab.distinct()
      .withColumnRenamed("__lid", "__plid").withColumnRenamed("__rid", "__rid")

    val joined = leftIds.join(pairs, leftIds("__lid") === pairs("__plid"), "left")
      .drop("__lid", "__plid")
    assemble(joined, rightIds, how, broadcastRight = false)
  }

  /** Driver-local general join over two collected sides: exact
    * interval-intersects in both directions (Sid.anyIntersects over
    * merged intervals — the same reference kernel the equivalence fuzz
    * asserts against), with join()'s output contract: left columns,
    * key_right (dense 0..n-1 right row ids, like pointJoin's), right
    * columns, clashes suffixed, how=left emitting one all-null right
    * row per unmatched left row. */
  private def localJoin(spark: org.apache.spark.sql.SparkSession,
                        leftRows: Array[org.apache.spark.sql.Row],
                        leftSchema: org.apache.spark.sql.types.StructType, leftSids: String,
                        rightRows: Array[org.apache.spark.sql.Row],
                        rightSchema: org.apache.spark.sql.types.StructType, rightSids: String,
                        how: String): DataFrame = {
    if (how != "left" && how != "inner")
      throw new IllegalArgumentException(s"how=$how (left|inner)")
    val lIdx = leftSchema.fieldIndex(leftSids)
    val rIdx = rightSchema.fieldIndex(rightSids)
    def cells(r: org.apache.spark.sql.Row, i: Int): Array[Long] = {
      val s = if (r.isNullAt(i)) null else r.getSeq[Long](i)
      if (s == null) Array.emptyLongArray else s.toArray
    }
    val rightCells = rightRows.map(cells(_, rIdx))
    val rightIntervals = rightCells.map(c =>
      if (c.isEmpty) Array.empty[(Long, Long)] else Sid.mergedIntervals(c))
    val clash = leftSchema.fieldNames.toSet.intersect(rightSchema.fieldNames.toSet)
    def suffixed(s: org.apache.spark.sql.types.StructType, suf: String, forceNull: Boolean) =
      s.fields.map { f =>
        val n = if (clash.contains(f.name)) f.name + suf else f.name
        f.copy(name = n, nullable = f.nullable || forceNull)
      }
    val outSchema = org.apache.spark.sql.types.StructType(
      suffixed(leftSchema, "_left", forceNull = false) ++
        (org.apache.spark.sql.types.StructField("key_right",
          org.apache.spark.sql.types.LongType, nullable = how == "left") +:
          suffixed(rightSchema, "_right", forceNull = how == "left")))
    val nullRight: Seq[Any] = Seq.fill(rightSchema.fields.length + 1)(null)
    val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    leftRows.foreach { lr =>
      val lc = cells(lr, lIdx)
      var matched = false
      if (lc.nonEmpty) {
        var j = 0
        while (j < rightRows.length) {
          if (rightCells(j).nonEmpty && Sid.anyIntersects(lc, rightIntervals(j))) {
            matched = true
            out += org.apache.spark.sql.Row.fromSeq(
              lr.toSeq ++ (j.toLong +: rightRows(j).toSeq))
          }
          j += 1
        }
      }
      if (!matched && how == "left")
        out += org.apache.spark.sql.Row.fromSeq(lr.toSeq ++ nullRight)
    }
    spark.createDataFrame(java.util.Arrays.asList(out.toSeq: _*), outSchema)
  }

  /** suffix clashing columns and finish the left/inner assembly. */
  private[operators] def assemble(leftWithRid: DataFrame, rightRows: DataFrame, how: String,
                                  broadcastRight: Boolean): DataFrame = {
    val leftCols = leftWithRid.columns.filter(_ != "__rid")
    val rightCols = rightRows.columns.filter(_ != "key_right")
    val clash = leftCols.toSet.intersect(rightCols.toSet)
    val l = clash.foldLeft(leftWithRid)((df, c) => df.withColumnRenamed(c, c + "_left"))
    val r = clash.foldLeft(rightRows)((df, c) => df.withColumnRenamed(c, c + "_right"))
    val joinType = how match {
      case "left"  => "left"
      case "inner" => "inner"
      case other   => throw new IllegalArgumentException(s"how=$other (left|inner)")
    }
    val rf = if (broadcastRight) broadcast(r) else r
    val out = l.join(rf, l("__rid") === r("key_right"), joinType)
    // column order: left columns, key_right, right columns (test_join.py:77-81)
    val ordered = l.columns.filter(_ != "__rid").map(out(_)) ++
      Array(out("key_right")) ++ r.columns.filter(_ != "key_right").map(out(_))
    out.select(ordered.toIndexedSeq: _*)
  }
}

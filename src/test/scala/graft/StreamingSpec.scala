package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.Sid
import graft.sources.Pods
import graft.streaming.StreamingIndex

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  case class Page(url: String, warc_ts: java.sql.Timestamp, text: String, lang: String)

  test("streaming index appends pod-partitioned parquet with checkpoint resume") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Page]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    mem.addData((1 to 50).map(i =>
      Page(s"https://x/$i", new java.sql.Timestamp(t0.getTime + i * 60000L), s"page number $i content words", "en")))

    val out = java.nio.file.Files.createTempDirectory("stream_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_ckpt").toString
    val q = StreamingIndex.start(mem.toDF(), out, ckpt)
    q.awaitTermination(60000)

    val got = spark.read.parquet(out)
    assert(got.count() === 50)
    assert(got.columns.contains("pod") && got.columns.contains("sid") && got.columns.contains("tid"))
    // deterministic sid for same url/text across the stream and batch paths
    val one = got.filter(col("url") === "https://x/7").select("sid").collect()
    assert(one.length === 1)

    // restart with same checkpoint: no duplicates (exactly-once sink)
    val q2 = StreamingIndex.start(mem.toDF(), out, ckpt)
    q2.awaitTermination(60000)
    assert(spark.read.parquet(out).count() === 50)

    // new data after resume lands exactly once
    mem.addData(Page("https://x/51", new java.sql.Timestamp(t0.getTime + 51 * 60000L), "late page", "en"))
    val q3 = StreamingIndex.start(mem.toDF(), out, ckpt)
    q3.awaitTermination(60000)
    assert(spark.read.parquet(out).count() === 51)
  }

  test("Pods.reconcile folds a streamed store into manifest-driven pruned reads") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Page]
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    mem.addData((1 to 60).map(i =>
      Page(s"https://r/$i", new java.sql.Timestamp(t0.getTime + i * 60000L),
        s"reconcile page $i with some words", "en")))
    val out = java.nio.file.Files.createTempDirectory("rec_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rec_ckpt").toString
    val q = StreamingIndex.start(mem.toDF(), out, ckpt)
    q.awaitTermination(60000)

    val full = spark.read.parquet(out)
    val n = full.count()
    assert(n === 60)
    // before reconcile: no manifests, catalog falls back to a data scan
    assert(Pods.manifests(out).isEmpty)

    Pods.reconcile(spark, out, "stream-reconcile-1", tsCol = Some("warc_ts"))
    assert(Pods.isCommitted(out, "stream-reconcile-1"))
    // catalog invariant (the q31 rule): manifest row counts describe
    // exactly what the stream committed
    val cat = Pods.catalog(spark, out)
    assert(cat.agg(sum(col("rowCount"))).collect()(0).getLong(0) === n)
    assert(cat.select("lineageId").distinct().collect().map(_.getString(0)).toSeq ===
      Seq("stream-reconcile-1"))

    // pod level inferred from bit alignment (pod ids are location-only)
    assert(Pods.snapshotPodLevel(out) === 4) // StreamingIndex.start's default
    // spatial pruning at listing time: a one-pod cover (that pod's
    // trixel as a level-4 sid) must read only that pod's directory and
    // return exactly its rows
    val someSid = full.orderBy("pod").select("sid").collect()(0).getLong(0)
    val somePod = someSid & Sid.clearMask(4)
    val got = Pods.read(spark, out, Array(somePod | 4L))
    assert(got.count() === full.filter(col("pod") === somePod).count())
    assert(got.inputFiles.nonEmpty && got.inputFiles.forall(_.contains(s"pod=$somePod")))

    // temporal pruning from the reconciled ts bounds: a disjoint year
    // prunes everything; a covering range loses nothing
    val none = Pods.read(spark, out, Array(somePod | 4L),
      timeRangeMs = Some((t0.getTime - 370L * 86400000L, t0.getTime - 365L * 86400000L)))
    assert(none.count() === 0)
    val all = Pods.read(spark, out, Array(somePod | 4L),
      timeRangeMs = Some((t0.getTime - 86400000L, t0.getTime + 86400000L)))
    assert(all.count() === got.count())

    // append another stream batch, reconcile again (idempotent re-derive):
    // the manifests pick up the new files
    mem.addData(Page("https://r/61", new java.sql.Timestamp(t0.getTime + 61 * 60000L),
      "reconcile late page", "en"))
    val q2 = StreamingIndex.start(mem.toDF(), out, ckpt)
    q2.awaitTermination(60000)
    Pods.reconcile(spark, out, "stream-reconcile-2", tsCol = Some("warc_ts"))
    assert(Pods.catalog(spark, out).agg(sum(col("rowCount"))).collect()(0).getLong(0) === 61)
  }

  test("reconcileIncremental folds only appended stream batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Page]
    val t0 = java.sql.Timestamp.valueOf("2025-02-01 00:00:00")
    mem.addData((1 to 40).map(i =>
      Page(s"https://inc/$i", new java.sql.Timestamp(t0.getTime + i * 60000L),
        s"incremental page $i words", "en")))
    val out = java.nio.file.Files.createTempDirectory("inc_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("inc_ckpt").toString
    StreamingIndex.start(mem.toDF(), out, ckpt).awaitTermination(60000)

    // first call on a manifest-less store = full reconcile fallback
    val n1 = Pods.reconcileIncremental(spark, out, "inc-1", tsCol = Some("warc_ts"))
    assert(n1 > 0)
    assert(Pods.isCommitted(out, "inc-1"))
    assert(Pods.catalog(spark, out).agg(sum(col("rowCount"))).collect()(0).getLong(0) === 40)
    // nothing appended: a no-op that leaves the commit untouched
    assert(Pods.reconcileIncremental(spark, out, "inc-noop", tsCol = Some("warc_ts")) === 0)
    assert(Pods.isCommitted(out, "inc-1"))

    // append a stream batch, fold it in incrementally
    mem.addData((41 to 45).map(i =>
      Page(s"https://inc/$i", new java.sql.Timestamp(t0.getTime + i * 60000L),
        s"incremental page $i words", "en")))
    StreamingIndex.start(mem.toDF(), out, ckpt).awaitTermination(60000)
    val n2 = Pods.reconcileIncremental(spark, out, "inc-2", tsCol = Some("warc_ts"))
    assert(n2 > 0 && Pods.isCommitted(out, "inc-2"))
    val cat = Pods.catalog(spark, out)
    assert(cat.agg(sum(col("rowCount"))).collect()(0).getLong(0) === 45)

    // merged manifests drive pruned reads exactly like a full reconcile:
    // per pod, the manifest-pruned read returns exactly that pod's rows
    val full = spark.read.parquet(out)
    val pods = full.select("pod").distinct().collect().map(_.getLong(0))
    val lvl = Pods.snapshotPodLevel(out)
    for (p <- pods.take(3)) {
      val got = Pods.read(spark, out, Array(p | lvl.toLong))
      assert(got.count() === full.filter(col("pod") === p).count(), s"pod $p")
    }
    // temporal bounds merged conservatively: a window past every event
    // prunes all; a covering window loses nothing
    val some = pods.head
    assert(Pods.read(spark, out, Array(some | lvl.toLong),
      timeRangeMs = Some((t0.getTime - 2000000L, t0.getTime - 1000000L))).count() === 0)
    assert(Pods.read(spark, out, Array(some | lvl.toLong),
      timeRangeMs = Some((t0.getTime - 86400000L, t0.getTime + 86400000L))).count() ===
      full.filter(col("pod") === some).count())
  }

  test("reconcileIncremental never rescans committed files (poisoned-file proof)") {
    val s = spark
    import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2025-03-01 00:00:00")
    def pages(ids: Range) = ids.map(i =>
      (s"https://poison/$i", new java.sql.Timestamp(t0.getTime + i * 60000L),
        s"poison proof page $i", "en")).toDF("url", "warc_ts", "text", "lang")
    val out = java.nio.file.Files.createTempDirectory("poison_out").toString
    val indexed = StreamingIndex.indexStream(pages(1 to 30))
    indexed.write.mode("overwrite").partitionBy("pod").parquet(out)
    Pods.reconcile(spark, out, "poison-1", tsCol = Some("warc_ts"))
    val before = Pods.catalog(spark, out).agg(sum(col("rowCount"))).collect()(0).getLong(0)
    assert(before === 30)

    // overwrite every committed parquet file with garbage: any attempt
    // to rescan them would now fail the incremental job
    val root = java.nio.file.Paths.get(out)
    val walk = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet") &&
          !p.getFileName.toString.startsWith("_"))
        .foreach(p => java.nio.file.Files.write(p, "not parquet".getBytes))
    } finally walk.close()

    // append fresh rows as new files, then fold them in: the incremental
    // scan must touch ONLY the appended files, so it succeeds even
    // though every previously-committed file is now unreadable
    StreamingIndex.indexStream(pages(31 to 36))
      .write.mode("append").partitionBy("pod").parquet(out)
    val n = Pods.reconcileIncremental(spark, out, "poison-2", tsCol = Some("warc_ts"))
    assert(n > 0 && Pods.isCommitted(out, "poison-2"))
    assert(Pods.catalog(spark, out).agg(sum(col("rowCount"))).collect()(0).getLong(0) === 36)
  }

  test("half-committed commit (files.json stale vs manifests) triggers full rebuild, not silent skip") {
    val s = spark
    import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2025-04-01 00:00:00")
    val pages = (1 to 25).map(i =>
      (s"https://crash/$i", new java.sql.Timestamp(t0.getTime + i * 60000L),
        s"crash window page $i", "en")).toDF("url", "warc_ts", "text", "lang")
    val out = java.nio.file.Files.createTempDirectory("crash_out").toString
    StreamingIndex.indexStream(pages).write.mode("overwrite").partitionBy("pod").parquet(out)
    Pods.reconcile(spark, out, "crash-1", tsCol = Some("warc_ts"))
    assert(Pods.catalog(spark, out).agg(sum(col("rowCount"))).collect()(0).getLong(0) === 25)

    // simulate a crash BETWEEN the two commit writes: manifests.json has
    // moved on (here: content perturbed) but files.json still carries
    // the binding hash of the previous manifests — the generation stamp
    // no longer matches, so the accounted set must be treated as unknown
    val mf = java.nio.file.Paths.get(out, "_manifests", "manifests.json")
    val perturbed = new String(java.nio.file.Files.readAllBytes(mf)) + "\n"
    java.nio.file.Files.write(mf, perturbed.getBytes)
    // old behavior: newFiles = onDisk minus accounted = empty -> returns 0
    // forever, silently. New behavior: mismatch -> full rebuild.
    val n = Pods.reconcileIncremental(spark, out, "crash-2", tsCol = Some("warc_ts"))
    assert(n > 0, "stale files.json must force a full rebuild, not a 0-file no-op")
    assert(Pods.isCommitted(out, "crash-2"))
    assert(Pods.catalog(spark, out).agg(sum(col("rowCount"))).collect()(0).getLong(0) === 25)

    // crash window 2: manifests + files.json landed but the SNAPSHOT
    // write did not — disk carries the PREVIOUS snapshot (here: its
    // stamp perturbed). newFiles alone would come out empty and the
    // stale lineage/totals would never be repaired; the snapshot-stamp
    // check must force the rebuild instead.
    val sf = java.nio.file.Paths.get(out, "_SNAPSHOT.json")
    val snapBody = new String(java.nio.file.Files.readAllBytes(sf))
    java.nio.file.Files.write(sf,
      snapBody.replaceAll(""""manifestsSha256":"[0-9a-f]+"""",
        """"manifestsSha256":"deadbeef"""").getBytes)
    val n2 = Pods.reconcileIncremental(spark, out, "crash-3", tsCol = Some("warc_ts"))
    assert(n2 > 0, "stale snapshot stamp must force a full rebuild")
    assert(Pods.isCommitted(out, "crash-3"))
    assert(Pods.catalog(spark, out).agg(sum(col("rowCount"))).collect()(0).getLong(0) === 25)

    // legacy window: a headerless (pre-stamp) files.json cannot prove it
    // matches the manifests — one full rebuild upgrades the store
    // instead of risking a double-merge after an interrupted re-commit
    val ff = java.nio.file.Paths.get(out, "_manifests", "files.json")
    val noHeader = new String(java.nio.file.Files.readAllBytes(ff))
      .linesIterator.filterNot(_.startsWith("#")).mkString("\n")
    java.nio.file.Files.write(ff, noHeader.getBytes)
    val n3 = Pods.reconcileIncremental(spark, out, "crash-4", tsCol = Some("warc_ts"))
    assert(n3 > 0, "headerless legacy files.json must force a full rebuild")
    assert(Pods.isCommitted(out, "crash-4"))
    assert(Pods.catalog(spark, out).agg(sum(col("rowCount"))).collect()(0).getLong(0) === 25)
  }

  test("streaming-sink orphan files are excluded from manifests and pruned reads") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Page]
    val t0 = java.sql.Timestamp.valueOf("2025-05-01 00:00:00")
    mem.addData((1 to 30).map(i =>
      Page(s"https://orphan/$i", new java.sql.Timestamp(t0.getTime + i * 60000L),
        s"orphan probe page $i", "en")))
    val out = java.nio.file.Files.createTempDirectory("orphan_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("orphan_ckpt").toString
    StreamingIndex.start(mem.toDF(), out, ckpt).awaitTermination(60000)

    // plant an orphan: a data file in a pod directory that the sink's
    // _spark_metadata commit log does NOT list (the leftover of a failed
    // micro-batch attempt) — duplicate an existing committed file
    val root = java.nio.file.Paths.get(out)
    val walk = java.nio.file.Files.walk(root)
    val committed = try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.filter(p =>
        p.getFileName.toString.endsWith(".parquet") &&
          !p.getFileName.toString.startsWith("_")).toSeq.head
    } finally walk.close()
    val orphan = committed.getParent.resolve("part-99999-orphan.snappy.parquet")
    java.nio.file.Files.copy(committed, orphan)

    Pods.reconcile(spark, out, "orphan-1", tsCol = Some("warc_ts"))
    // the orphan's rows appear in neither the manifests nor a pruned read
    assert(Pods.catalog(spark, out).agg(sum(col("rowCount"))).collect()(0).getLong(0) === 30)
    val lvl = Pods.snapshotPodLevel(out)
    val allPods = spark.read.parquet(out).select("pod").distinct().collect().map(_.getLong(0))
    val total = allPods.map(p => Pods.read(spark, out, Array(p | lvl.toLong)).count()).sum
    assert(total === 30, "pruned reads must honor the sink commit log, not the directory listing")
    // and the orphan stays permanently un-merged by incremental calls
    assert(Pods.reconcileIncremental(spark, out, "orphan-2", tsCol = Some("warc_ts")) === 0)
  }

  test("windowed pod counts with watermark drop late rows past the threshold") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Page]
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    // batch 1: rows in two 5-minute windows, advancing the watermark
    mem.addData((0 until 20).map(i =>
      Page(s"https://w/$i", new java.sql.Timestamp(t0.getTime + i * 30000L), s"window page $i", "en")))
    val out = java.nio.file.Files.createTempDirectory("wm_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("wm_ckpt").toString
    val counts = StreamingIndex.podCounts(mem.toDF())
    val q = counts.writeStream
      .format("parquet")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(out)
    q.awaitTermination(60000)
    // batch 2: a row 30 minutes older than the max seen (far past the
    // 1-minute watermark) plus a fresh row to close earlier windows
    mem.addData(
      Page("https://w/late", new java.sql.Timestamp(t0.getTime - 1800000L), "too late", "en"),
      Page("https://w/new", new java.sql.Timestamp(t0.getTime + 3600000L), "fresh page", "en"))
    val q2 = counts.writeStream
      .format("parquet")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(out)
    q2.awaitTermination(60000)
    val got = spark.read.parquet(out)
    // closed windows cover the 20 on-time rows; the too-late row's
    // window (t0-30min) must not appear
    val sums = got.agg(sum(col("pages"))).collect()(0).getLong(0)
    assert(sums === 20)
    val lateWindowStart = new java.sql.Timestamp(t0.getTime - 1800000L)
    val lateRows = got.filter(col("window.start") <= lateWindowStart &&
      col("window.end") > lateWindowStart).count()
    assert(lateRows === 0)
  }

  test("stateful streaming dedup: first-seen passes, repeats drop, state keyed by hash") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Page]
    val t0 = java.sql.Timestamp.valueOf("2024-05-01 08:00:00")
    def page(i: Int, text: String) =
      Page(s"https://d/$i", new java.sql.Timestamp(t0.getTime + i * 60000L), text, "en")
    // batch 1: A, B, A (in-batch repeat)
    mem.addData(page(1, "content A"), page(2, "content B"), page(3, "content A"))
    val out = java.nio.file.Files.createTempDirectory("dd_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dd_ckpt").toString
    val dedup = StreamingIndex.dedupStream(mem.toDF())
    def runBatch(): Unit = {
      val q = dedup.writeStream
        .format("parquet")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(out)
      q.awaitTermination(60000)
    }
    runBatch()
    val b1 = spark.read.parquet(out)
    assert(b1.count() === 2) // A once, B once
    assert(b1.select("text").collect().map(_.getString(0)).toSet === Set("content A", "content B"))
    // batch 2: A again (cross-batch repeat, state remembers) + C (new)
    mem.addData(page(4, "content A"), page(5, "content C"))
    runBatch()
    val b2 = spark.read.parquet(out)
    assert(b2.count() === 3)
    assert(b2.select("text").collect().map(_.getString(0)).toSet ===
      Set("content A", "content B", "content C"))
    // the first-seen URL was kept for A, not the repeat's
    assert(b2.filter(col("text") === "content A").select("url").collect()
      .map(_.getString(0)).toSet === Set("https://d/1"))
    // batch 3 advances the watermark past A's keep-alive horizon
    // (timeout ~ t0+15min; watermark after this batch ~ t0+29min)
    mem.addData(page(30, "content D"))
    runBatch()
    // batch 4: A returns AFTER expiry — state was dropped (bounded
    // state: the dedup horizon is keepAliveMs, not the corpus)
    mem.addData(page(31, "content A"))
    runBatch()
    val b4 = spark.read.parquet(out)
    assert(b4.count() === 5)
    assert(b4.filter(col("text") === "content A").count() === 2)
  }
}

package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Sid
import graft.functions.StareFunctions._

/** STAREPods: SID-partitioned storage with per-partition manifests and
  * idempotent resume.
  *
  * The reference groups rows by the sid cleared to the pod level and
  * writes one pickle per trixel directory (staredataframe.py:1086-1297),
  * reading back with spatial+temporal partition pruning (io/pod.py:24-259).
  * Here: Parquet partitioned by `pod` (cleared location at pod level),
  * optional second partition column `tchunk` (temporal chunk id), plus an
  * Iceberg-style snapshot: one JSON manifest per pod partition carrying
  * {pod, sidMin, sidMax, rowCount, lineageId} and a final atomically-
  * renamed _SNAPSHOT.json committing the write. A rerun of the same
  * lineageId short-circuits if the snapshot exists (idempotent resume);
  * dynamic partition overwrite makes partial rewrites safe.
  */
object Pods {

  final case class PodManifest(pod: Long, sidMin: Long, sidMax: Long, rowCount: Long)

  def write(df: DataFrame, path: String, sidCol: String, podLevel: Int,
            lineageId: String, tchunkCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    val snapshotFile = Paths.get(path, "_SNAPSHOT.json")
    if (Files.exists(snapshotFile)) {
      val existing = new String(Files.readAllBytes(snapshotFile), StandardCharsets.UTF_8)
      if (existing.contains(s""""lineageId":"$lineageId"""")) return // committed: resume is a no-op
    }
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    val withPod = df.withColumn("pod", starePod(col(sidCol), podLevel))
    val partCols = "pod" +: tchunkCol.toSeq
    // cluster rows by partition key before writing: without this every
    // task writes a sliver into every pod directory (tasks x pods small
    // files — measured 5x slower at sf0.1 and hostile to readers at scale)
    withPod
      .repartition(partCols.map(col): _*)
      .sortWithinPartitions(col(sidCol))
      .write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

    // per-pod manifests (SID range + row count) — north-rule lineage/
    // metrics. One consolidated file, atomically renamed: per-pod files
    // were the slowest part of the bench roundtrip at a few hundred
    // pods and would be 10^5 tiny files at production pod counts.
    val mans = withPod.groupBy(col("pod"))
      .agg(min(col(sidCol)).as("sidMin"), max(col(sidCol)).as("sidMax"), count(lit(1)).as("rowCount"))
      .collect()
      .map(r => PodManifest(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_.pod)

    val manifestDir = Paths.get(path, "_manifests")
    Files.createDirectories(manifestDir)
    val entries = mans.map { m =>
      s"""{"pod":${m.pod},"podHex":"${Sid.hex(m.pod)}","sidMin":${m.sidMin},"sidMax":${m.sidMax},""" +
        s""""rowCount":${m.rowCount},"lineageId":"$lineageId"}"""
    }
    atomicWrite(manifestDir.resolve("manifests.json").toString,
      entries.mkString("[\n", ",\n", "\n]"))
    val snapshot =
      s"""{"lineageId":"$lineageId","podLevel":$podLevel,"pods":${mans.length},""" +
        s""""rows":${mans.map(_.rowCount).sum},"committedAtMs":${System.currentTimeMillis()}}"""
    atomicWrite(snapshotFile.toString, snapshot)
  }

  private def atomicWrite(dest: String, content: String): Unit = {
    val tmp = Paths.get(dest + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dest), StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def isCommitted(path: String, lineageId: String): Boolean = {
    val f = Paths.get(path, "_SNAPSHOT.json")
    Files.exists(f) && new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      .contains(s""""lineageId":"$lineageId"""")
  }

  /** Read with spatial partition pruning: only pods whose interval
    * intersects the query cover are scanned (partition filter -> no
    * file IO outside the requested pods; the reference reads chunk
    * globs per sid, io/pod.py:166-230). */
  def read(spark: SparkSession, path: String, cover: Array[Long]): DataFrame = {
    val df = spark.read.parquet(path)
    val podLevel = snapshotPodLevel(path)
    val pods = podsForCover(cover, podLevel)
    df.filter(col("pod").isin(pods: _*))
  }

  def readAll(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  def snapshotPodLevel(path: String): Int = {
    val s = new String(Files.readAllBytes(Paths.get(path, "_SNAPSHOT.json")), StandardCharsets.UTF_8)
    """"podLevel":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toInt)
      .getOrElse(sys.error("no podLevel in snapshot"))
  }

  /** Catalog of a pod store (folder2catalog analog, reference
    * io/folder.py:83-131): one row per pod partition with its SID range,
    * row count and lineage — read from the JSON manifests, no data scan. */
  def catalog(spark: SparkSession, path: String): DataFrame = {
    val f = Paths.get(path, "_manifests", "manifests.json")
    val rows = if (!Files.exists(f)) Seq.empty else {
      val s = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      s.linesIterator.filter(_.trim.startsWith("{")).map { line =>
        def l(k: String) = (s""""$k":(-?\\d+)""").r.findFirstMatchIn(line).map(_.group(1).toLong).getOrElse(0L)
        def str(k: String) = (s""""$k":"([^"]*)"""").r.findFirstMatchIn(line).map(_.group(1)).getOrElse("")
        (l("pod"), str("podHex"), l("sidMin"), l("sidMax"), l("rowCount"), str("lineageId"))
      }.toSeq
    }
    import spark.implicits._
    rows.toDF("pod", "podHex", "sidMin", "sidMax", "rowCount", "lineageId")
  }

  /** pod ids (cleared locations at podLevel) overlapping a cover. */
  def podsForCover(cover: Array[Long], podLevel: Int): Seq[Long] = {
    val inc = Sid.increment(podLevel)
    Sid.mergedIntervals(cover).flatMap { case (lo, hi) =>
      val start = lo & Sid.clearMask(podLevel)
      Iterator.iterate(start)(_ + inc).takeWhile(_ < hi).toSeq
    }.distinct.toSeq
  }
}

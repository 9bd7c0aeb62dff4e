package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.StareFunctions._
import graft.sources.Webtext

/** Streaming ingest: continuously geotag + STARE-index arriving web
  * pages and append them to a pod-partitioned store.
  *
  * The reference is batch-only (SURVEY.md §2.7); this is the
  * Spark-native extension for continuously-crawled input. Exactly-once
  * into the sink comes from Structured Streaming checkpointing (file
  * sink commit log) — the batch Pods manifest/resume machinery covers
  * the batch path, the checkpoint covers the stream path.
  */
object StreamingIndex {

  /** Geotag + index a stream of webtext rows (url, warc_ts, text, lang). */
  def indexStream(pages: DataFrame, level: Int = 26, podLevel: Int = 4): DataFrame = {
    val tagged = pages
      // stream rows carry no doc_id; derive deterministically (bounded so
      // the geotag arithmetic cannot overflow ANSI bigint multiplication)
      .withColumn("doc_id", pmod(xxhash64(col("url")), lit(1000000000L)))
      .withColumn("lat", expr(Webtext.latExpr))
      .withColumn("lon", expr(Webtext.lonExpr))
      .withColumn("sid", stareSid(col("lat"), col("lon"), level))
      .withColumn("pod", starePod(col("sid"), podLevel))
      .withColumn("tid", stareTiv(col("warc_ts")))
    tagged
  }

  /** windowed per-pod page counts with late-data handling — the
    * monitoring stream (1-minute watermark, 5-minute tumbling window). */
  def podCounts(pages: DataFrame, level: Int = 26, podLevel: Int = 4): DataFrame =
    indexStream(pages, level, podLevel)
      .withWatermark("warc_ts", "1 minute")
      .groupBy(window(col("warc_ts"), "5 minutes"), col("pod"))
      .agg(count(lit(1)).as("pages"))

  /** Stateful streaming exact-dedup: first-seen pages pass, repeats are
    * dropped, keyed by a 128-bit content hash with
    * `flatMapGroupsWithState` (the custom-state path — `dropDuplicates`
    * cannot bound or inspect its state). State is one boolean per
    * distinct content hash and EXPIRES at the event-time watermark +
    * `keepAliveMs`, so state size tracks the distinct-content rate within
    * the horizon, not the corpus — the property that matters on an
    * unbounded crawl. The key is the hash (16 bytes), never the text,
    * mirroring the batch exactDedup shuffle-key rule. */
  def dedupStream(pages: DataFrame, keepAliveMs: Long = 600000L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = pages.sparkSession
    import s.implicits._
    val keyed = pages
      .withWatermark("warc_ts", "1 minute")
      .select(col("url"), col("warc_ts"), col("text"), col("lang"),
        concat_ws(":", xxhash64(col("text"), lit(1)), xxhash64(col("text"), lit(2))).as("__key"))
      .as[(String, java.sql.Timestamp, String, String, String)]
      .groupByKey(_._5)
    keyed.flatMapGroupsWithState[Boolean, (String, java.sql.Timestamp, String, String)](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      case (_, rows, state: GroupState[Boolean]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val list = rows.toSeq // bounded by the group's batch slice
          val out = if (state.exists || list.isEmpty) Iterator.empty
            else { // first-seen = earliest event time (deterministic)
              val r = list.minBy(_._2.getTime)
              Iterator.single((r._1, r._2, r._3, r._4))
            }
          state.update(true)
          // anchor the expiry to event time as well as the watermark: in
          // the FIRST micro-batch the watermark is still 0 (it advances
          // at batch boundaries), and 0 + keepAlive is already in the
          // past of any real event-time clock — the state would silently
          // expire before batch 2 and repeats would pass
          val evMax = if (list.nonEmpty) list.map(_._2.getTime).max else 0L
          state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs(), evMax) + keepAliveMs)
          out
        }
    }.toDF("url", "warc_ts", "text", "lang")
  }

  /** start the append sink: pod-partitioned parquet + checkpoint. */
  def start(pages: DataFrame, outPath: String, checkpoint: String,
            level: Int = 26, podLevel: Int = 4): StreamingQuery =
    indexStream(pages, level, podLevel)
      .writeStream
      .partitionBy("pod")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start(outPath)
}

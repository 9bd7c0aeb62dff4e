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

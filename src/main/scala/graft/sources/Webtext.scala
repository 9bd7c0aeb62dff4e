package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's primary input: an Iceberg-style table of Common-Crawl-
  * style web pages `(url, warc_ts, html, text, lang)` (BASELINE.json
  * input_hint), synthesized deterministically from the driver-provided
  * `documents` table — no external data, fixed content per doc_id, so
  * the per-url `text` byte-identity invariant holds across runs by
  * construction and is asserted via hashes in tests.
  *
  * Geotagging is a pure projection of (text, doc_id): a deterministic
  * hash of the text's shape mapped into lat ∈ [-85, 85], lon ∈ [-180,
  * 180). Expressed in native Spark SQL arithmetic (and mirrored 1:1 in
  * the DuckDB oracle SQL in SparkEntry.oracleSql) so the correctness
  * gate can replay it.
  */
object Webtext {

  /** SQL fragments shared verbatim with the DuckDB oracle. Modulo-only
    * integer arithmetic, then ONE division by a double literal: `1e4`,
    * not `10000.0` — Spark types a decimal-point literal as DECIMAL and
    * the resulting BigDecimal division dominated the whole geotag+join
    * pipeline in profiles (MutableBigInteger.divide in every task). */
  val latExpr =
    "(((length(text) * 2654435761 + ascii(substr(text, 1, 1)) * 7919 + doc_id * 131) % 1700000) / 1e4 - 85.0)"
  val lonExpr =
    "(((doc_id * 2654435761 + length(text) * 97003 + ascii(substr(text, 1, 1)) * 131) % 3600000) / 1e4 - 180.0)"

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** documents -> webtext table (url, warc_ts, html, text, lang). */
  def table(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .withColumn("url", concat(lit("https://crawl.example/"), col("lang"), lit("/"),
        col("source"), lit("/"), col("doc_id")))
      .withColumn("warc_ts",
        timestamp_seconds(lit(1700000000L) + col("doc_id") * 61 % 31536000))
      .withColumn("html", to_binary(
        concat(lit("<html><body>"), col("text"), lit("</body></html>")), lit("utf-8")))
      .select("url", "warc_ts", "html", "text", "lang", "doc_id")

  /** geotag: deterministic lat/lon extracted from the stored text. */
  def geotagged(webtext: DataFrame): DataFrame =
    webtext
      .withColumn("lat", expr(latExpr))
      .withColumn("lon", expr(lonExpr))
}

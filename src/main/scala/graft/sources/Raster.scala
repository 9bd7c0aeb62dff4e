package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.StareFunctions._

/** Raster -> dataframe conversion (read_geotiff analog, reference
  * io/geotiff.py:37-112): generate the (x, y) pixel grid distributed
  * with spark.range, apply the affine transform to lon/lat, and encode
  * per-pixel SIDs at a level adapted to the pixel pitch (the reference's
  * adapt_level=True — here the pitch is explicit from the transform).
  * No raster codec is needed for the grid/geometry part; pixel values
  * join in by (x, y) from whatever decoded the imagery (see
  * pipeline.Multimodal for the binary-payload path). */
object Raster {

  /** affine: lon = originLon + x*dx, lat = originLat + y*dy (north-up
    * rasters have dy < 0). */
  def gridToDf(spark: SparkSession, width: Int, height: Int,
               originLon: Double, originLat: Double, dx: Double, dy: Double,
               adaptLevel: Boolean = true, level: Int = 26): DataFrame = {
    val pitch = math.max(math.abs(dx), math.abs(dy))
    val lvl = if (adaptLevel) graft.core.Htm.adaptiveLevel(pitch) else level
    spark.range(width.toLong * height)
      .withColumn("x", (col("id") % width).cast("int"))
      .withColumn("y", expr(s"id div $width").cast("int"))
      .withColumn("lon", lit(originLon) + col("x") * dx)
      .withColumn("lat", lit(originLat) + col("y") * dy)
      .withColumn("sid", stareSid(col("lat"), col("lon"), lvl))
      .drop("id")
  }
}

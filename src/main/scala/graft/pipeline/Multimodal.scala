package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio payloads as opaque `binary`
  * columns with typed metadata, batch-shaped feature extraction.
  *
  * The decode step is STUBBED (no image/audio codecs ship in this
  * container): `decodeStub` derives deterministic fake features from the
  * bytes. Everything around it — schema, batched mapPartitions shape,
  * partition sizing — is real: swapping `decodeStub` for a JNI/FFmpeg
  * call changes nothing structurally.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),        // stub-derived
    StructField("height", IntegerType),       // stub-derived
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** STUB decode: deterministic pseudo-features from the payload bytes.
    * Replace with a real codec at deployment; signature/batching stay. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    var h = 1469598103934665603L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L; i += 1 }
    val w = 64 + (math.abs(h) % 1024).toInt
    val ht = 64 + (math.abs(h >> 10) % 1024).toInt
    val feat = Array.tabulate(8)(j => (((h >> (j * 8)) & 0xff).toFloat - 128f) / 128f)
    (w, ht, feat)
  }

  /** Batched per-partition feature extraction over (url, html[binary]).
    * mapPartitions keeps codec state (decoder contexts, model handles)
    * per task rather than per row — the shape that matters at 100 TB. */
  def extractFeatures(webtext: DataFrame): DataFrame = {
    val spark = webtext.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    webtext.select(col("url"), col("html")).mapPartitions { rows =>
      // per-partition "codec" init would go here
      rows.map { r =>
        val url = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, feat) = decodeStub(bytes)
        Row(url, bytes.length.toLong, w, h, feat.toSeq)
      }
    }(enc)
  }
}

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

  val resizedSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("thumb", BinaryType)))

  /** STUB resize: a deterministic fixed-size "thumbnail" derived from
    * the payload (one byte per output pixel row, FNV-folded). Real
    * plumbing: binary in -> binary out, target dims as metadata columns,
    * batched per partition. */
  def resize(webtext: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(resizedSchema)
    webtext.select(col("url"), col("html")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        var h = 1469598103934665603L
        var i = 0
        while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L; i += 1 }
        val thumb = new Array[Byte](targetH)
        var y = 0
        while (y < targetH) { thumb(y) = ((h >>> (y % 8 * 8)) & 0xff).toByte; y += 1 }
        Row(r.getString(0), targetW, targetH, thumb)
      }
    }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("frame_idx", IntegerType),
    StructField("ts_ms", LongType),
    StructField("frame", BinaryType),
    StructField("frame_hash", LongType)))

  /** Frame sampling — the one-to-MANY multimodal shape (a "video"
    * payload fans out into per-frame rows with timestamps): batched
    * flatMap inside mapPartitions, per-frame metadata typed, frame
    * payload an opaque binary. The decode is the same declared stub
    * (frame count and bytes derive deterministically from the payload
    * FNV — mirrored exactly in the q39 DuckDB oracle in HUGEINT
    * arithmetic); a real demuxer swaps in without changing the schema,
    * the fan-out shape, or the partition sizing. */
  def sampleFrames(webtext: DataFrame, everyMs: Long = 1000L): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameSchema)
    webtext.select(col("url"), col("html")).mapPartitions { rows =>
      rows.flatMap { r =>
        val url = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        var h = 1469598103934665603L
        var i = 0
        while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L; i += 1 }
        val payloadHash = h
        // 1..7 frames, unsigned remainder (mirrors HUGEINT % in SQL)
        val n = 1 + java.lang.Long.remainderUnsigned(payloadHash, 7L).toInt
        (0 until n).iterator.map { f =>
          val fh = payloadHash * (f + 1) // wraps mod 2^64 like the oracle
          val frame = Array.tabulate[Byte](8)(j => ((fh >>> (j * 8)) & 0xff).toByte)
          Row(url, f, f * everyMs, frame, fh)
        }
      }
    }(enc)
  }
}

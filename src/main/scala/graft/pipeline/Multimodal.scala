package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio payloads as opaque `binary`
  * columns with typed metadata, batch-shaped feature extraction.
  *
  * IMAGES are handled by a REAL codec path (`decodeImage`,
  * `extractImageFeatures`, `resizeImages`, `encodePng`): the JDK's own
  * `javax.imageio` ships PNG/JPEG/BMP/GIF readers and PNG/JPEG writers,
  * headless-safe, no external library needed — verified in-sandbox and
  * oracle-gated end-to-end (q49 encode→decode, q50 decode→resize→
  * re-encode→decode, exact pixel math both).
  *
  * Only AUDIO/VIDEO demux remains STUBBED (no FFmpeg-class codecs in
  * the JDK): `decodeStub`/`sampleFrames` derive deterministic fake
  * features from the bytes. Everything around those — schema, batched
  * mapPartitions shape, partition sizing — is real: swapping the stub
  * for a JNI/FFmpeg call changes nothing structurally.
  */
object Multimodal {

  /** One-time codec setup, evaluated lazily from the codec entry points
    * (NOT a static initializer — class-loading this object must not
    * flip global JVM state for apps that never touch the codec):
    * headless so ImageIO never probes a display (only when unset — a
    * GUI-embedding driver keeps its own setting), and no disk cache —
    * the default FileCacheImageInput/OutputStream creates a temp file
    * per read/write, which at one-per-row in mapPartitions is millions
    * of create/delete syscalls for byte-array streams that need none. */
  private lazy val codecInit: Unit = {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** Decode-or-None with failure classification: `None` = the PAYLOAD is
    * not a decodable image (no reader claims it, a recognized format is
    * corrupt, or a decoder trips on malformed data) — callers drop such
    * rows. Environmental failures (plain IOException: disk full, task
    * interrupt) PROPAGATE and fail the task — silently dropping rows on
    * them would return truncated results with no error. */
  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    codecInit
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch {
      case _: javax.imageio.IIOException => None
      case _: java.io.EOFException => None // truncated payload a reader claimed
      case _: RuntimeException => None // decoder bugs on malformed payloads
    }
  }

  /** HEADER-ONLY metadata probe: (format, width, height) without pixel
    * decode. `ImageReader.getWidth/getHeight` read only the header
    * (SOF0 marker for JPEG, IHDR for PNG), so at crawl scale this is
    * the cheap first stage — filter by dims/format, THEN pay full
    * decode on the survivors only. None when no reader claims the
    * payload or the header is malformed. */
  def imageMeta(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    codecInit
    if (bytes == null) return None
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(in, true, true) // seekForwardOnly, ignoreMetadata
          Some((reader.getFormatName.toLowerCase(java.util.Locale.ROOT),
            reader.getWidth(0), reader.getHeight(0)))
        } catch {
          case _: java.io.IOException => None // malformed header in a claimed payload
          case _: RuntimeException => None
        } finally reader.dispose()
      }
    } finally in.close()
  }

  /** Shared scaffold for the batched (id, img binary) → typed-row image
    * frames: enforces the 2-column input shape and id-name collision
    * guard once, drops rows where `f` declines (null payload included —
    * a crawl column is never 100% clean), and makes every drop
    * OBSERVABLE through the named `graft.image.droppedRows` accumulator
    * (Spark UI / `sc.longAccumulator` value): at 100 TB a silent drop
    * rate is indistinguishable from truncation, so it must be a metric. */
  private def idBinaryFrame(df: DataFrame, outFields: Seq[StructField])(
      f: Array[Byte] => Option[Seq[Any]]): DataFrame = {
    require(df.schema.fields.length == 2, "expected exactly (id, img) columns")
    val idField = df.schema.fields(0)
    require(!outFields.exists(_.name == idField.name),
      s"id column '${idField.name}' collides with an output column")
    val schema = StructType(idField +: outFields)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val dropped = df.sparkSession.sparkContext.longAccumulator("graft.image.droppedRows")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val out = if (bytes == null) None else f(bytes)
        if (out.isEmpty) dropped.add(1)
        out.map(vals => Row.fromSeq(r.get(0) +: vals))
      }
    }(enc)
  }

  /** Batched header-only metadata: input exactly (id, img); output
    * (id, byte_len, format, width, height). Unclaimed payloads dropped
    * (counted in `graft.image.droppedRows`). The 100 TB shape: a
    * dims/format predicate here prunes the rows that ever reach
    * `extractImageFeatures`' full pixel decode. */
  def imageMetaFrame(df: DataFrame): DataFrame =
    idBinaryFrame(df, Seq(
      StructField("byte_len", LongType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))) { bytes =>
      imageMeta(bytes).map { case (fmt, w, h) => Seq[Any](bytes.length.toLong, fmt, w, h) }
    }

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

  // ---------------------------------------------------------------- //
  //                    REAL image codec path (JDK)                    //
  // ---------------------------------------------------------------- //

  /** PNG-encode a solid-color RGB image (lossless; byte-exact round
    * trip). Doubles as the deterministic image synthesizer for tests,
    * benches, and the q49/q50 oracles — no external data needed. */
  def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    codecInit
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb & 0xffffff))
    g.fillRect(0, 0, width, height)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "no PNG image writer registered in this JVM") // write() returning
    // false writes NOTHING — an empty payload here would silently empty
    // every downstream query instead of failing with a cause
    bos.toByteArray
  }

  /** Alpha-composite a packed ARGB pixel over a WHITE background →
    * packed RGB. Transparent pixels carry undefined RGB (often palette
    * black in logo PNGs/GIFs); averaging them raw skews features dark.
    * Opaque pixels (a=255, every TYPE_INT_RGB image) pass through
    * bit-exact, so the closed-form oracles are unaffected. */
  @inline private def overWhite(p: Int): Int = {
    val a = p >>> 24
    if (a == 255) p & 0xffffff
    else {
      val inv = 255 - a
      (((a * ((p >> 16) & 0xff) + inv * 255) / 255) << 16) |
        (((a * ((p >> 8) & 0xff) + inv * 255) / 255) << 8) |
        ((a * (p & 0xff) + inv * 255) / 255)
    }
  }

  /** REAL decode via javax.imageio (PNG/JPEG/BMP/GIF): dimensions and
    * per-channel mean, transparency composited over white (`overWhite`).
    * None when the payload is not a decodable image — callers drop such
    * rows (a crawl column is never 100% clean); environmental I/O
    * failures propagate (see `readImage`). */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double)] =
    readImage(bytes).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      // one bulk getRGB: per-pixel calls go through the color model per
      // pixel and measured ~10x slower on large images
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < px.length) {
        val p = overWhite(px(i))
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        i += 1
      }
      val n = w.toLong * h
      (w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }

  /** Batched REAL image feature extraction. Input: exactly (id, img
    * binary) — the id column (any type, e.g. url or doc_id) passes
    * through untouched, so no join-back is needed. Undecodable payloads
    * are dropped (counted in `graft.image.droppedRows`). */
  def extractImageFeatures(df: DataFrame): DataFrame =
    idBinaryFrame(df, Seq(
      StructField("byte_len", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType))) { bytes =>
      decodeImage(bytes).map { case (w, h, mr, mg, mb) =>
        Seq[Any](bytes.length.toLong, w, h, mr, mg, mb)
      }
    }

  /** Exact area-averaged scale of packed-RGB pixels: each target pixel
    * is the area-weighted mean of the source rectangle it maps to
    * (fractional edge coverage included), rounded half-up per channel.
    * Deterministic pure math — deliberately NOT `getScaledInstance` +
    * `drawImage(.., observer = null)`, whose filtered-image production
    * is asynchronous by contract and can draw partially on some JVMs. */
  private[graft] def areaAverage(
      src: Array[Int], sw: Int, sh: Int, tw: Int, th: Int): Array[Int] = {
    val out = new Array[Int](tw * th)
    val xs = sw.toDouble / tw
    val ys = sh.toDouble / th
    var ty = 0
    while (ty < th) {
      val y0 = ty * ys; val y1 = (ty + 1) * ys
      var tx = 0
      while (tx < tw) {
        val x0 = tx * xs; val x1 = (tx + 1) * xs
        var sr = 0.0; var sg = 0.0; var sb = 0.0; var area = 0.0
        var y = math.floor(y0).toInt
        while (y < math.ceil(y1) && y < sh) {
          val wy = math.min(y1, y + 1.0) - math.max(y0, y.toDouble)
          var x = math.floor(x0).toInt
          while (x < math.ceil(x1) && x < sw) {
            val wx = math.min(x1, x + 1.0) - math.max(x0, x.toDouble)
            val w = wx * wy
            val p = src(y * sw + x)
            sr += w * ((p >> 16) & 0xff); sg += w * ((p >> 8) & 0xff); sb += w * (p & 0xff)
            area += w
            x += 1
          }
          y += 1
        }
        out(ty * tw + tx) =
          (math.round(sr / area).toInt << 16) | (math.round(sg / area).toInt << 8) |
            math.round(sb / area).toInt
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Batched REAL resize: decode (any JDK-readable format) → exact
    * area-averaged scale (`areaAverage`) → PNG re-encode. Input: exactly
    * (id, img); output (id, width, height, thumb). Undecodable payloads
    * dropped (counted in `graft.image.droppedRows`). */
  def resizeImages(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, s"bad target ${targetW}x$targetH")
    idBinaryFrame(df, Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("thumb", BinaryType))) { bytes =>
      readImage(bytes).map { src =>
        val sw = src.getWidth; val sh = src.getHeight
        // composite transparency over white BEFORE averaging — hidden
        // RGB under alpha=0 must not bleed into thumbnail pixels
        val px = src.getRGB(0, 0, sw, sh, null, 0, sw)
        var i = 0
        while (i < px.length) { px(i) = overWhite(px(i)); i += 1 }
        val scaled = areaAverage(px, sw, sh, targetW, targetH)
        val dst = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        dst.setRGB(0, 0, targetW, targetH, scaled, 0, targetW)
        val bos = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(dst, "png", bos),
          "no PNG image writer registered in this JVM")
        Seq[Any](targetW, targetH, bos.toByteArray)
      }
    }
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

package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns travelling beside typed metadata. The Spark-side
  * machinery (schema, batching, partition-local decode, feature columns)
  * is real; for video/audio the codec is STUBBED with a deterministic
  * fake (`decodeStub`) because those media libraries aren't in this
  * container — a real deployment swaps the stub for an actual decoder
  * inside the same `mapPartitions` (partition-local, batched, no driver
  * involvement). For IMAGES the codec is REAL: `pngRoundtrip` encodes and
  * decodes actual PNG bytes through `javax.imageio` (pure JVM, in every
  * JRE), proving the seam carries genuine binary media work.
  */
object Multimodal {

  /** Deterministic fake "decode": derives plausible media metadata purely
    * from the payload bytes. Stands in for ??? (real codec).
    */
  private[operators] def decodeStub(payload: Array[Byte]): (Int, Int, Int, String) = {
    val n = payload.length
    val width = 64 + (n % 1024)
    val height = 64 + ((n * 7) % 768)
    val frames = 1 + (n % 30)
    val format = if (n % 2 == 0) "rgb8" else "yuv420"
    (width, height, frames, format)
  }

  /** SQL-expressible metadata over the binary payload (oracle-checkable):
    * byte length, sha256 checksum, and stub-derived dimensions. The
    * documents table's text doubles as the payload (cast to binary).
    */
  def meta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        length(col("text").cast("binary")).as("byte_len"),
        sha2(col("text").cast("binary"), 256).as("checksum"),
        (lit(64) + length(col("text").cast("binary")) % 1024).as("width"),
        (lit(64) + (length(col("text").cast("binary")) * 7) % 768).as("height"),
        (lit(1) + length(col("text").cast("binary")) % 30).as("frames"))

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frames", IntegerType),
    StructField("format", StringType),
  ))

  /** Partition-local decode → feature rows. This is the real plumbing a
    * decoder plugs into: binary payloads arrive batched per partition,
    * features leave as typed columns; no data ever crosses the driver.
    */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    payloads.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val (w, h, f, fmt) = decodeStub(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), w, h, f, fmt)
      }
    }(enc)
  }

  /** Deterministic fake "resize" to a 64×64 thumbnail: truncate the
    * payload to its first 256 CHARACTERS when decoded as UTF-8 (stands in
    * for ??? real image downsampling). Character (not byte) truncation so a
    * multi-byte code point is never split and the result matches a
    * `substring(text, 1, 256)` formulation exactly on non-ASCII corpora.
    */
  private[operators] def resizeStub(payload: Array[Byte]): Array[Byte] = {
    val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    val nCp = s.codePointCount(0, s.length)
    val end = s.offsetByCodePoints(0, math.min(256, nCp))
    s.substring(0, end).getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  private val resizedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("thumb", BinaryType),
  ))

  /** Resize: binary→binary transformation, partition-local via
    * mapPartitions (the shape a real image library plugs into). The
    * emitted columns are derived metadata + checksum of the new payload,
    * so the result is oracle-checkable without shipping binaries around.
    */
  def resizeThumbnail(s: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(resizedSchema)
    payloads.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val thumb = resizeStub(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), 64, 64, thumb)
      }
    }(enc)
      .select(col("doc_id"), col("width"), col("height"),
        length(col("thumb")).as("thumb_len"),
        sha2(col("thumb"), 256).as("thumb_sha"))
  }

  /** Frame sampling: every `step`-th frame index of the stub-decoded
    * frame count, exploded to one row per sampled frame — the fan-out
    * shape of a video pipeline (decode happens per emitted frame
    * downstream, never materializing whole videos).
    */
  def frameSample(s: SparkSession, dir: String, step: Int = 4): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        (lit(1) + length(col("text").cast("binary")) % 30).as("frames"))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("frames") - 1, lit(step))).as("frame_idx"))

  /** Deterministic synthetic PNG for `docId`: a w×h RGB image whose every
    * pixel channel is a pure function of (docId, x, y), encoded to REAL
    * PNG bytes by javax.imageio. Because the pixel formula is closed-form
    * and PNG is lossless, anything recovered from a decode is
    * SQL-predictable — the trick that makes a genuine binary codec
    * oracle-checkable.
    */
  private[graft] def syntheticPng(docId: Long): Array[Byte] = {
    val w = (16 + docId % 48).toInt
    val h = (16 + (docId * 7) % 48).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // write the backing int raster directly: for TYPE_INT_RGB this stores
    // exactly what setRGB would, without its per-call color-model hop
    val px = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 31 + y * 17 + docId) % 256).toInt
        val g = ((x * 13 + y * 29 + docId * 3) % 256).toInt
        val b = ((x * 7 + y * 11 + docId * 5) % 256).toInt
        px(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode: parse PNG bytes with javax.imageio and return
    * (width, height, sum of all RGB channel values) read from the DECODED
    * PIXELS — not from any metadata shortcut.
    */
  private[graft] def decodePng(payload: Array[Byte]): (Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val (w, h) = (img.getWidth, img.getHeight)
    // one bulk ARGB read instead of a per-pixel getRGB color-model hop;
    // values are identical ints, just fetched in one converted pass
    val row = new Array[Int](w)
    var sum = 0L
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    (w, h, sum)
  }

  private val pngSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("px_sum", LongType),
  ))

  /** Real-codec round trip, partition-local: synthesize PNG bytes per doc,
    * then DECODE them with javax.imageio and emit width/height/pixel-sum
    * read from the decoded image. The oracle recomputes the same numbers
    * from the closed-form pixel function, so a hash match proves actual
    * PNG binary work happened losslessly inside the mapPartitions seam —
    * the same seam decodeFeatures/resizeThumbnail stub. Encode+decode stay
    * inside one task (no payload shuffle); ImageIO's disk cache is off so
    * executor threads never contend on temp files.
    */
  def pngRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir).select(col("doc_id"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(pngSchema)
    ids.mapPartitions { rows: Iterator[Row] =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h, sum) = decodePng(syntheticPng(id))
        Row(id, w, h, sum)
      }
    }(enc)
  }

  /** Deterministic synthetic WAV for `docId`: 16-bit signed little-endian
    * mono PCM whose every sample is a pure function of (docId, t), wrapped
    * in a REAL RIFF/WAVE container by javax.sound.sampled. WAV PCM is
    * lossless, so anything recovered from a decode is SQL-predictable —
    * the same closed-form trick as syntheticPng.
    */
  private[graft] def syntheticWav(docId: Long): Array[Byte] = {
    val n = (256 + docId % 512).toInt
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      // int16 in [-32768, 32767], exactly (docId*31 + t*17) % 65536 - 32768
      val v = (((docId * 31 + t.toLong * 17) % 65536) - 32768).toInt
      pcm(2 * t) = (v & 0xff).toByte
      pcm(2 * t + 1) = ((v >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 16, 1, /* signed = */ true, /* bigEndian = */ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode: parse WAV bytes with javax.sound.sampled and
    * return (sample count, sample sum, abs-sample sum) computed from the
    * DECODED PCM frames — not from any metadata shortcut.
    */
  private[graft] def decodeWav(payload: Array[Byte]): (Int, Long, Long) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"unexpected decoded format: $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    var sum = 0L
    var absSum = 0L
    var i = 0
    while (i < n) {
      val v = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff))
      sum += v
      absSum += math.abs(v)
      i += 1
    }
    (n, sum, absSum)
  }

  private val wavSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_samples", IntegerType),
    StructField("sample_sum", LongType),
    StructField("sample_abs_sum", LongType),
  ))

  /** Real-codec round trip for AUDIO, partition-local: synthesize WAV
    * bytes per doc, DECODE them with javax.sound.sampled and emit
    * count/sum/abs-sum read from the decoded PCM. The oracle recomputes
    * the same numbers from the closed-form sample function, so a hash
    * match proves an actual RIFF/WAVE encode→decode happened losslessly
    * inside the mapPartitions seam — completing the real-codec story
    * (q69 images, q72 audio; video has no pure-JVM decoder, so its stub
    * is the honest ceiling in this container).
    */
  def wavRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir).select(col("doc_id"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(wavSchema)
    ids.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(0)
        val (n, sum, absSum) = decodeWav(syntheticWav(id))
        Row(id, n, sum, absSum)
      }
    }(enc)
  }
}

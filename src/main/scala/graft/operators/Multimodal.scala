package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns travelling beside typed metadata, decoded inside
  * `mapPartitions` (partition-local, batched, no driver involvement).
  * The codecs are REAL wherever a pure-JVM library exists: PNG
  * encode/decode (`pngRoundtrip`), 2×2 box-mean resize through a double
  * PNG round trip (`resizeThumbnail`), multi-frame GIF encode/decode
  * with frame sampling (`frameSample`) via `javax.imageio`, and
  * RIFF/WAVE PCM via `javax.sound.sampled` (`wavRoundtrip`). Since
  * round 18 the metadata/decode seams (`meta`/`decodeFeatures`) are
  * real too: magic-byte container sniffing routed to genuine
  * javax.imageio/javax.sound parses across all three modalities. The
  * one thing still absent is arbitrary VIDEO container parsing — no
  * JRE ships a decoder; the multi-frame GIF path stands in for the
  * frame-axis semantics, and a real deployment plugs its video codec
  * into the same sniff-and-route seam.
  */
object Multimodal {

  /** The WAVE codec providers, resolved ONCE via the public SPI.
    * `AudioSystem.getAudioInputStream`/`write` re-enter a SYNCHRONIZED
    * provider registry on every call (JDK13Services), which serializes
    * all 32 executor threads: the round-14 A/B on 500k clips measured
    * 92.4 s through AudioSystem vs 0.61 s through the cached providers —
    * a 150× lock-contention tax, not codec work. The providers ARE the
    * same javax.sound WAVE reader/writer classes, so bytes and decodes
    * are identical; only the per-call registry lookup is skipped.
    */
  private lazy val wavReaderProvider: javax.sound.sampled.spi.AudioFileReader = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.find { r =>
        try {
          r.getAudioInputStream(new java.io.ByteArrayInputStream(
            syntheticWav(0L))).close(); true
        } catch { case _: Exception => false }
      }.getOrElse(throw new IllegalStateException(
        "no WAVE AudioFileReader provider on this JVM"))
  }

  private lazy val wavWriterProvider: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala.find(_.isFileTypeSupported(
        javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException(
        "no WAVE AudioFileWriter provider on this JVM"))
  }

  /** Container sniff from leading magic bytes — the dispatch a real
    * ingest runs before choosing a decoder. Payloads arrive as opaque
    * binaries; trusting a declared format column is how a pipeline feeds
    * GIF bytes to a PNG decoder, so the router reads the bytes.
    */
  private[graft] def sniffContainer(payload: Array[Byte]): String = {
    def ascii(i: Int, s: String): Boolean =
      payload.length >= i + s.length &&
        s.indices.forall(j => (payload(i + j) & 0xff) == s.charAt(j).toInt)
    if (payload.length >= 4 && (payload(0) & 0xff) == 0x89 && ascii(1, "PNG")) "png"
    else if (ascii(0, "GIF")) "gif"
    else if (ascii(0, "RIFF") && ascii(8, "WAVE")) "wav"
    else "unknown"
  }

  /** The tri-modal payload for a doc: REAL container bytes, round-robin
    * across the three codecs this JVM genuinely ships — PNG (docId%3=0),
    * multi-frame GIF (=1), RIFF/WAVE PCM (=2). Every downstream number
    * is read back out of these bytes by the matching real decoder; the
    * synthesis parameters are closed-form, which is what keeps genuine
    * codec work oracle-checkable (the syntheticPng trick, per modality).
    */
  private[graft] def syntheticPayload(docId: Long): Array[Byte] =
    (docId % 3) match {
      case 0 => syntheticPng(docId)
      case 1 => syntheticGif(docId)
      case _ => syntheticWav(docId)
    }

  private val metaSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("container", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
  ))

  /** REAL container-metadata extraction, header-only (q26): sniff the
    * payload's magic bytes, then read dimensions/frame counts from the
    * actual container structures — javax.imageio readers for PNG/GIF
    * (`getWidth(0)` parses IHDR / the logical screen descriptor without
    * decoding pixel data), javax.sound for WAVE (`getFrameLength` from
    * the fmt/data chunks). This is the metadata pass a curation pipeline
    * runs over every object BEFORE deciding what to decode — cheap,
    * partition-local, no pixel/PCM work. The round-17 stub
    * (length-derived fake dimensions) is retired; the emitted numbers
    * now come out of real containers, and the oracle recomputes them
    * from the synthesis closed forms.
    */
  def meta(s: SparkSession, dir: String): DataFrame =
    meta(Tables.documents(s, dir))

  def meta(docs: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(metaSchema)
    ids.mapPartitions { rows: Iterator[Row] =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val payload = syntheticPayload(id)
        sniffContainer(payload) match {
          case "wav" =>
            val ais = wavReaderProvider.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            try Row(id, "wav", null, null, ais.getFrameLength.toInt)
            finally ais.close()
          case img @ ("png" | "gif") =>
            // per-format thread-local reader (round 19): the sniff picks
            // the SLOT, but every emitted value — the container name
            // included — still comes from the reader's actual header
            // parse, which throws on bytes the sniffed format cannot
            // parse. The former per-row `getImageReaders` registry probe
            // re-scanned the SPI list and built a fresh reader for every
            // object; the probe reads the same magic bytes the sniff
            // already matched, so the chosen reader class is identical.
            val slot = if (img == "png") pngReaderTL else gifReaderTL
            val reader = slot.get()
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(payload))
            try {
              reader.setInput(iis)
              // container name from the READER (the parse), not the sniff
              val fmt = reader.getFormatName.toLowerCase
              val frames = if (img == "gif") reader.getNumImages(true) else 1
              Row(id, fmt, reader.getWidth(0), reader.getHeight(0), frames)
            } catch { case e: Throwable =>
              reader.dispose(); slot.remove(); throw e
            } finally {
              try reader.setInput(null) catch { case _: Throwable => () }
              iis.close()
            }
          case other =>
            throw new IllegalArgumentException(
              s"doc $id: unrecognized container ($other)")
        }
      }
    }(enc)
  }

  /** Media census (q302): the corpus-level modality inventory a curation
    * pipeline reports before deciding decode budgets — per container,
    * object count, total frames (PNG 1, GIF decoded frame count, WAVE
    * PCM frames), and the dimension envelope. Rides [[meta]]'s real
    * header parse, then ONE map-side-combined aggregate; output is
    * |containers| rows, scale-flat past the metadata pass.
    */
  def mediaCensus(s: SparkSession, dir: String): DataFrame =
    mediaCensus(Tables.documents(s, dir))

  def mediaCensus(docs: DataFrame): DataFrame =
    meta(docs)
      .groupBy(col("container"))
      .agg(
        count(lit(1)).as("n_objects"),
        sum(col("n_frames")).as("total_frames"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"))

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frames", IntegerType),
    StructField("content_sum", LongType),
  ))

  /** REAL partition-local decode → feature rows (q27): the payload is
    * sniffed and routed to the matching genuine codec, and every emitted
    * feature is computed from the DECODED content — PNG pixel sums over
    * the full raster, GIF pixel sums across every decoded frame, WAVE
    * abs-sample sums over the decoded PCM. This is the plumbing a
    * production decoder plugs into: binary payloads arrive batched per
    * partition, typed features leave, no data ever crosses the driver —
    * and since round 18 no stubbed step remains anywhere on it.
    */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir).select(col("doc_id"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    ids.mapPartitions { rows: Iterator[Row] =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val payload = syntheticPayload(id)
        sniffContainer(payload) match {
          case "png" =>
            val (w, h, sum) = decodePng(payload)
            Row(id, "png", w, h, 1, sum)
          case "gif" =>
            val frames = decodeGifFrames(payload)
            Row(id, "gif", 8, 8, frames.length,
              frames.iterator.map(_._2).sum)
          case "wav" =>
            val (n, _, absSum) = decodeWav(payload)
            Row(id, "wav", null, null, n, absSum)
          case other =>
            throw new IllegalArgumentException(
              s"doc $id: unrecognized container ($other)")
        }
      }
    }(enc)
  }

  /** REAL image downscale: per-channel 2×2 box mean with integer floor —
    * dst(x,y).c = (src(2x,2y).c + src(2x+1,2y).c + src(2x,2y+1).c +
    * src(2x+1,2y+1).c) / 4 — odd trailing row/column dropped. Exact
    * integer arithmetic on genuinely decoded pixels, which is what lets
    * the q36 oracle recompute the thumbnail closed-form (a filtered
    * AffineTransformOp would do the same work with unspecified rounding,
    * unverifiable across engines).
    */
  private[graft] def boxHalf(src: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
    val (w, h) = (src.getWidth / 2, src.getHeight / 2)
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val dst = out.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    val row0 = new Array[Int](src.getWidth)
    val row1 = new Array[Int](src.getWidth)
    var y = 0
    while (y < h) {
      src.getRGB(0, 2 * y, src.getWidth, 1, row0, 0, src.getWidth)
      src.getRGB(0, 2 * y + 1, src.getWidth, 1, row1, 0, src.getWidth)
      var x = 0
      while (x < w) {
        val (a, b, c, d) = (row0(2 * x), row0(2 * x + 1), row1(2 * x), row1(2 * x + 1))
        val r = (((a >> 16) & 0xff) + ((b >> 16) & 0xff) + ((c >> 16) & 0xff) + ((d >> 16) & 0xff)) / 4
        val g = (((a >> 8) & 0xff) + ((b >> 8) & 0xff) + ((c >> 8) & 0xff) + ((d >> 8) & 0xff)) / 4
        val bl = ((a & 0xff) + (b & 0xff) + (c & 0xff) + (d & 0xff)) / 4
        dst(y * w + x) = (r << 16) | (g << 8) | bl
        x += 1
      }
      y += 1
    }
    out
  }

  private val resizedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("px_sum", LongType),
  ))

  /** REAL resize round trip, partition-local: synthesize the q69 PNG,
    * DECODE it with javax.imageio, downscale with the 2×2 box mean,
    * RE-ENCODE the thumbnail as PNG, decode THAT, and emit the
    * thumbnail's dims + pixel sum read from the re-decoded image. Every
    * emitted number has passed through two genuine PNG codecs and real
    * pixel arithmetic; the oracle recomputes it all closed-form (PNG is
    * lossless, the box mean is exact integer math). Replaces the prior
    * byte-truncation stand-in — no stubbed step remains on this path.
    */
  def resizeThumbnail(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir).select(col("doc_id"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(resizedSchema)
    ids.mapPartitions { rows: Iterator[Row] =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val src = readPng(syntheticPng(id))
        val (w, h, sum) = decodePng(writePngFast(boxHalf(src)))
        Row(id, w, h, sum)
      }
    }(enc)
  }

  /** Deterministic synthetic animated GIF for `docId`: `1 + docId % 8`
    * frames of 8×8 indexed-color pixels over a 256-gray palette, each
    * pixel a pure function of (docId, frame, x, y), written as a REAL
    * multi-frame GIF by javax.imageio's sequence writer. Indexed gray
    * makes the round trip lossless (GIF's 256-color palette holds the
    * whole value space exactly), so decoded frames are SQL-predictable —
    * the syntheticPng trick extended to the time axis.
    */
  private[graft] def syntheticGif(docId: Long): Array[Byte] =
    writeGifSequence((1 + docId % 8).toInt)((f, x, y) =>
      ((x * 31 + y * 17 + docId + f * 7) % 256).toInt)

  /** Shared multi-frame GIF encoder: 8×8 indexed gray, one frame per
    * `pixel(f, x, y)` evaluation. The writer and its ImageOutputStream
    * are released in try/finally — an encode exception must not leak
    * them (they hold native buffers; the leak compounds at a
    * per-executor-thread rate under retry storms).
    */
  private def writeGifSequence(frames: Int)(
      pixel: (Int, Int, Int) => Int): Array[Byte] = {
    val grays = Array.tabulate(256)(v => ((v << 16) | (v << 8) | v))
    val palette = new java.awt.image.IndexColorModel(
      8, 256, grays, 0, false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
    val writer = gifWriterTL.get()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < frames) {
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
          val px = img.getRaster
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              px.setSample(x, y, 0, pixel(f, x, y))
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
      } catch { case e: Throwable =>
        writer.dispose(); gifWriterTL.remove(); throw e
      }
    } finally {
      try writer.setOutput(null) catch { case _: Throwable => () }
      ios.close()
    }
    bos.toByteArray
  }

  /** REAL multi-frame decode: parse GIF bytes with javax.imageio, count
    * the frames from the container, and return per-frame pixel sums read
    * from the DECODED indexed rasters (gray level = any RGB channel).
    */
  private[graft] def decodeGifFrames(payload: Array[Byte]): Seq[(Int, Long)] =
    decodeGifGray(payload).zipWithIndex.map { case (g, f) =>
      (f, g.foldLeft(0L)(_ + _))
    }

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("px_sum", LongType),
  ))

  /** REAL frame sampling, partition-local: synthesize the multi-frame
    * GIF, DECODE it, and emit every `step`-th frame with a pixel sum
    * computed from that decoded frame — the fan-out shape of a video
    * pipeline (one row per sampled frame; whole videos never shuffle),
    * with the frame count read from the real container, not metadata.
    * Replaces the prior stub-derived frame count — both multimodal
    * fan-out paths now run genuine codecs end to end.
    */
  def frameSample(s: SparkSession, dir: String, step: Int = 2): DataFrame = {
    val ids = Tables.documents(s, dir).select(col("doc_id"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(frameSchema)
    ids.mapPartitions { rows: Iterator[Row] =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        val frames = decodeGifFrames(syntheticGif(id))
        frames.collect { case (f, sum) if f % step == 0 =>
          Row(id, f, frames.length, sum)
        }
      }
    }(enc)
  }

  // --------------------------------------------------------------------
  // GIF scene-cut detection (q279): keyframe segmentation for curation
  // --------------------------------------------------------------------

  /** Deterministic synthetic CLIP for q279: `2 + docId % 7` frames of
    * 8×8 indexed gray, with a SCENE change every 3 frames — the scene
    * index rotates the gradient DIRECTION (`x·(31+37p) + y·(17+53p)`),
    * because for a delta fingerprint an additive change (the
    * [[syntheticGif]] `f·7` term) is just brightness and detects
    * nothing; within a scene frames drift by +3 brightness per frame.
    * Real multi-frame GIF bytes via javax.imageio, lossless indexed
    * gray, fully closed-form for the oracle.
    */
  private[graft] def syntheticClipGif(docId: Long): Array[Byte] =
    writeGifSequence((2 + docId % 7).toInt) { (f, x, y) =>
      val p = f / 3
      ((x * (31 + 37L * p) + y * (17 + 53L * p) + docId + f * 3) % 256).toInt
    }

  /** 63-bit frame fingerprint over a DECODED 8×8 gray frame: bit i set
    * iff raster pixel i+1 > pixel i (row-major). Sign-of-delta again —
    * brightness-invariant, gradient-direction-sensitive, exactly what a
    * scene cut moves and a within-scene drift does not. */
  private[graft] def frameFp63(img: java.awt.image.BufferedImage): Long =
    frameFp63(grayRaster8(img))

  /** Row-major 8×8 gray levels of a decoded frame (indexed gray: any RGB
    * channel is the level). */
  private[graft] def grayRaster8(img: java.awt.image.BufferedImage): Array[Int] = {
    val g = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        g(y * 8 + x) = (img.getRGB(x, y) >> 16) & 0xff
        x += 1
      }
      y += 1
    }
    g
  }

  private[graft] def frameFp63(g: Array[Int]): Long = {
    var hash = 0L
    var i = 0
    while (i < 63) {
      if (g(i + 1) > g(i)) hash |= 1L << i
      i += 1
    }
    hash
  }

  private val sceneSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame", IntegerType),
    StructField("fp", LongType),
  ))

  /** Per-frame fingerprints through the REAL GIF codec, one row per
    * decoded frame (the frameSample fan-out shape — whole clips never
    * shuffle; ≤ 8 rows leave per doc). */
  /** Frame fps of one q279 clip through the real codec — the kernel the
    * batch window path and the zero-state streaming monitor share. */
  private[graft] def clipFrameFpSeq(docId: Long): IndexedSeq[Long] =
    decodeGifGray(syntheticClipGif(docId)).map(frameFp63)

  def clipFrameFps(docs: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(sceneSchema)
    ids.mapPartitions { rows: Iterator[Row] =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        clipFrameFpSeq(id).zipWithIndex.map { case (fp, f) => Row(id, f, fp) }
      }
    }(enc)
  }

  /** GIF scene-cut detection (q279): the keyframe-segmentation pass a
    * video-curation pipeline runs before sampling training frames —
    * storing every frame of every clip is waste, one frame per SCENE is
    * the curated unit. Consecutive decoded frames are compared by their
    * 63-bit delta fingerprints; a Hamming jump > `cutThreshold` opens a
    * new scene (frame 0 always does), and `scene_id` numbers scenes per
    * clip with a running sum over the per-doc frame window (clips are
    * ≤ 8 frames — the window partitions by doc_id, never global).
    * Output: one row per frame with its distance-to-previous, cut flag,
    * and scene number; a keyframe sampler keeps `new_scene` rows.
    *
    * Scale: the codec pass is partition-local and linear in frames; the
    * lag/scene numbering shuffles once on doc_id with ≤ 8 rows per key.
    */
  def sceneCuts(s: SparkSession, dir: String): DataFrame =
    sceneCuts(Tables.documents(s, dir))

  def sceneCuts(docs: DataFrame, cutThreshold: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame"))
    clipFrameFps(docs)
      .withColumn("prev_fp", lag(col("fp"), 1).over(w))
      .withColumn("hamming_prev",
        when(col("prev_fp").isNull, lit(-1))
          .otherwise(bit_count(col("fp").bitwiseXOR(col("prev_fp")))))
      .withColumn("new_scene",
        col("hamming_prev") === -1 || col("hamming_prev") > cutThreshold)
      .withColumn("scene_id", sum(when(col("new_scene"), 1L).otherwise(0L))
        .over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .select(col("doc_id"), col("frame"), col("hamming_prev"),
        col("new_scene"), col("scene_id"))
  }

  /** Deterministic synthetic PNG for `docId`: a w×h RGB image whose every
    * pixel channel is a pure function of (docId, x, y), encoded to REAL
    * PNG bytes by javax.imageio. Because the pixel formula is closed-form
    * and PNG is lossless, anything recovered from a decode is
    * SQL-predictable — the trick that makes a genuine binary codec
    * oracle-checkable.
    */
  /** Lossless PNG encode at deflate level 0 (STORE): JDK 9+'s PNG writer
    * maps compressionQuality 1.0 to the fastest deflate level, and PNG is
    * lossless at EVERY level — decoded pixels (and so every emitted
    * width/height/pixel-sum/dHash) are bit-identical to the default-level
    * encode, while the deflate pass that dominated the per-row codec cost
    * disappears. Nothing in the repo (or its oracles) reads encoded BYTE
    * LENGTHS, only decoded content and container headers, both invariant.
    * Falls back to default parameters if the writer refuses compression
    * control.
    */
  /** Thread-local codec instances (round-19, guide §1.2 "per-task
    * work" / the §4.5 initialise-once discipline transplanted to the
    * JVM): `ImageIO.read`/`getImageWritersByFormatName` re-scan the SPI
    * registry and instantiate a fresh reader/writer PER ROW.
    * `setInput`/`setOutput` is the documented reuse protocol; a codec
    * that throws is disposed and dropped from its slot so a corrupted
    * internal state can never leak into the next row. Streams are
    * constructed directly (`MemoryCache*`) — no registry lookup, no
    * disk-backed cache file, and no null factory result to guard
    * (the round-18 ADVICE writePngFast NPE hazard is gone by
    * construction). Decoded pixels and encoded semantics are untouched.
    */
  private def codecTL[T <: AnyRef](mk: () => T): ThreadLocal[T] =
    new ThreadLocal[T] { override def initialValue(): T = mk() }
  private val pngReaderTL = codecTL(() =>
    javax.imageio.ImageIO.getImageReadersByFormatName("png").next())
  private val pngWriterTL = codecTL(() =>
    javax.imageio.ImageIO.getImageWritersByFormatName("png").next())
  private val gifReaderTL = codecTL(() =>
    javax.imageio.ImageIO.getImageReadersByFormatName("gif").next())
  private val gifWriterTL = codecTL(() =>
    javax.imageio.ImageIO.getImageWritersByFormatName("gif").next())

  /** Decode one PNG payload with the thread-local reader — same pixels
    * as `ImageIO.read`, minus the per-row registry scan, reader
    * construction and stream-factory hop. */
  private[graft] def readPng(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val reader = pngReaderTL.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      reader.read(0)
    } catch { case e: Throwable =>
      reader.dispose(); pngReaderTL.remove(); throw e
    } finally {
      try reader.setInput(null) catch { case _: Throwable => () }
      iis.close()
    }
  }

  private[graft] def writePngFast(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = pngWriterTL.get()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      try {
        writer.setOutput(ios)
        val p = writer.getDefaultWriteParam
        if (p.canWriteCompressed) {
          p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
          p.setCompressionQuality(1.0f)
        }
        writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } catch { case e: Throwable =>
        writer.dispose(); pngWriterTL.remove(); throw e
      }
    } finally {
      try writer.setOutput(null) catch { case _: Throwable => () }
      ios.close()
    }
    bos.toByteArray
  }

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
    writePngFast(img)
  }

  /** REAL image decode: parse PNG bytes with javax.imageio and return
    * (width, height, sum of all RGB channel values) read from the DECODED
    * PIXELS — not from any metadata shortcut.
    */
  private[graft] def decodePng(payload: Array[Byte]): (Int, Int, Long) = {
    val img = readPng(payload)
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
    * the same seam decodeFeatures/resizeThumbnail run. Encode+decode stay
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
    wavWriterProvider.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode: parse WAV bytes with javax.sound.sampled and
    * return (sample count, sample sum, abs-sample sum) computed from the
    * DECODED PCM frames — not from any metadata shortcut.
    */
  private[graft] def decodeWav(payload: Array[Byte]): (Int, Long, Long) = {
    val ais = wavReaderProvider.getAudioInputStream(
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
    * (q69 images, q72 audio; video has no pure-JVM decoder — the
    * multi-frame GIF path is the honest frame-axis ceiling in this
    * container).
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

  // --------------------------------------------------------------------
  // Image perceptual-hash near-dup (q277): dHash + Hamming-banded LSH
  // --------------------------------------------------------------------

  /** Docs planted as near-duplicate image twins: every `doc_id ≡ 3
    * (mod 17)` carries a brightness-perturbed RE-ENCODE of `doc_id - 1`'s
    * image (decode the neighbour's actual PNG bytes, +6 per channel with
    * mod-256 wrap, encode again). The wrap makes the perturbation
    * non-trivial — cells whose means straddle a wrap flip a few dHash
    * bits — while staying closed-form, so the DuckDB oracle recomputes
    * the twin's pixels (and hence its hash) exactly.
    */
  private[graft] def plantedTwin(docId: Long): Boolean =
    docId >= 1 && docId % 17 == 3

  private[graft] def syntheticImageWithTwins(docId: Long): Array[Byte] =
    if (!plantedTwin(docId)) syntheticPng(docId)
    else {
      val img = readPng(syntheticPng(docId - 1))
      val w = img.getWidth
      val h = img.getHeight
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val r = (((rgb >> 16) & 0xff) + 6) % 256
          val g = (((rgb >> 8) & 0xff) + 6) % 256
          val b = ((rgb & 0xff) + 6) % 256
          row(x) = (r << 16) | (g << 8) | b
          x += 1
        }
        out.setRGB(0, y, w, 1, row, 0, w)
        y += 1
      }
      writePngFast(out)
    }

  /** 64-bit difference hash over DECODED pixels: gray = (r+g+b)/3 per
    * pixel (integer floor), box-mean over a 9×8 cell grid with exact
    * floor boundaries (cell i spans x ∈ [⌊i·w/9⌋, ⌊(i+1)·w/9⌋)), bit
    * `j·8 + i` set iff cell(i+1, j) > cell(i, j). Every step is integer
    * arithmetic on losslessly-decoded pixels, which is what lets the
    * oracle rebuild the hash from the closed-form pixel function. The
    * size normalization (any w×h collapses to the same grid) is what
    * buys re-encode/resize/brightness robustness — the classic dHash
    * contract.
    */
  private[graft] def dHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val row = new Array[Int](w)
    // per-cell gray sums in one pixel pass: cell of x is (9x+8)/w, of y
    // is (8y+7)/h — the closed form of the floor boundaries above
    val sums = new Array[Long](9 * 8)
    val cnts = new Array[Long](9 * 8)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      val cj = (8 * y + 7) / h
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        val ci = (9 * x + 8) / w
        sums(cj * 9 + ci) += gray
        cnts(cj * 9 + ci) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        val a = sums(j * 9 + i) / cnts(j * 9 + i)
        val b = sums(j * 9 + i + 1) / cnts(j * 9 + i + 1)
        if (b > a) hash |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    hash
  }

  private val dhashSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("dhash", LongType),
  ))

  /** Per-doc 64-bit dHash through the REAL codec path: synthesize (or
    * twin-perturb + re-encode) the PNG, decode it with javax.imageio,
    * hash the decoded pixels — all inside one task, no payload shuffle.
    */
  def imageDHashes(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val ids = docs.select(("doc_id" +: carry).map(col): _*)
    val schema = StructType(
      dhashSchema.fields.toSeq ++ carry.map(c => docs.schema(c)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    ids.mapPartitions { rows: Iterator[Row] =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val img = readPng(syntheticImageWithTwins(id))
        Row.fromSeq(id +: dHash64(img) +: (1 until r.length).map(r.get))
      }
    }(enc)
  }

  /** 4×16-bit band keys of a 64-bit fingerprint column — the shared
    * candidate-key generator for [[hammingBandedPairs]] and the
    * streaming ingest monitors. */
  private[graft] def bandKeys16(fps: DataFrame, fpCol: String,
      carry: Seq[String] = Nil): DataFrame =
    fps.select(Seq(col("doc_id"), col(fpCol)) ++ carry.map(col) :+
        posexplode(array((0 until 4).map(b =>
          shiftright(col(fpCol), 16 * b).bitwiseAND(lit(65535L))): _*)): _*)
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "k")

  /** Image near-duplicate pairs (q277): Hamming-banded LSH over the
    * dHashes — the missing image-side dedup modality (the text side has
    * MinHash/SimHash q21–q23, embeddings have SemDedup q204; this is
    * the perceptual-hash family: re-encodes, resizes, brightness shifts
    * of the SAME image land within a few dHash bits of each other).
    *
    * Candidates come from 4 bands of 16 bits (the q23 SimHash banding
    * discipline): a pair is considered iff SOME band matches exactly —
    * at 64 bits and ≤ `maxHamming` flips the probability all four bands
    * are hit stays low, and random cross-doc hashes collide in a 16-bit
    * band at ~2⁻¹⁶. A 16-bit band universe SATURATES once the corpus
    * passes ~2¹⁶ docs, and a raw within-bucket self-join then grows
    * quadratically in bucket occupancy (measured: exponent ~1.6 at
    * 10/30/100× on the first cut). So bucket enumeration is BOUNDED —
    * the q270/q275 per-anchor-window contract: within each (band, key)
    * bucket, a doc pairs only with the next `window` members by doc_id
    * (probe keys generated by an offset explode joined back on
    * (band, key, rank) — strictly linear ×window, never an in-bucket
    * n² join; plan-pinned no-cartesian/no-broadcast). Saturated buckets
    * are exactly the low-information band values, so the cap costs
    * recall only where the band carried no signal; at genuinely 100-TB
    * image corpora the honest fix for recall is a LONGER perceptual
    * hash (dHash-256 → 64-bit bands), not wider enumeration — the
    * documented anti-quadratic knob. Candidates dedup on (a, b) before
    * one codegen'd `bit_count(xor)` verify on the full 64-bit hashes.
    *
    * Output: verified pairs (doc_a < doc_b) with their Hamming
    * distance — dominated by the planted twin population (~1/17 of
    * docs, id-adjacent so their in-bucket rank distance is exactly 1),
    * so the result scales with the dup rate, not the corpus.
    */
  def imageDHashDups(s: SparkSession, dir: String): DataFrame =
    imageDHashDups(Tables.documents(s, dir))

  /** Shared derived artifact (the round-16 pattern): q280's fusion and
    * q277's own row both read the identical verified pair set, and the
    * codec decode behind it is the expensive stage — materialized once
    * per (input generation, hamming, window) via [[graft.Derived]].
    * Plan pins live on [[imageDHashDupsInline]] (the build plan).
    */
  def imageDHashDups(docs: DataFrame, maxHamming: Int = 10,
      window: Int = 8): DataFrame =
    graft.Derived.materialized(docs.sparkSession,
      s"img_dhash_pairs_h${maxHamming}_w$window", Seq(docs)) {
      imageDHashDupsInline(docs, maxHamming, window)
    }

  private[graft] def imageDHashDupsInline(docs: DataFrame, maxHamming: Int = 10,
      window: Int = 8): DataFrame =
    hammingBandedPairs(imageDHashes(docs), "dhash", maxHamming, window)

  /** The shared Hamming-banded near-dup join over any (doc_id, 64-bit
    * fingerprint) relation — q277's image dHashes and q278's audio
    * frame-energy fingerprints ride the identical plan: 4×16-bit band
    * keys, per-bucket rank, the bounded next-`window` probe explode
    * (linear ×window — the anti-saturation contract measured in
    * SCALE_r14), pair dedup, one codegen'd bit_count(xor) verify.
    */
  private def hammingBandedPairs(fps: DataFrame, fpCol: String,
      maxHamming: Int, window: Int): DataFrame = {
    val hashes = graft.Caches.track(fps)
    val bands = bandKeys16(hashes, fpCol)
    // rank within the (band, key) bucket: a per-bucket window, never a
    // global sort (the partition key scales with corpus × 4)
    val ranked = graft.Caches.track(bands.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("k")).orderBy(col("doc_id")))))
    val probes = ranked.select(col("band"), col("k"),
      col("doc_id").as("doc_a"), col(fpCol).as("ha"),
      explode(array((1 to window).map(j => col("rn") + j): _*)).as("rn"))
    val cand = probes.hint("shuffle_hash")
      .join(ranked.select(col("band"), col("k"), col("rn"),
          col("doc_id").as("doc_b"), col(fpCol).as("hb"))
          .hint("shuffle_hash"),
        Seq("band", "k", "rn"))
      .select(col("doc_a"), col("doc_b"), col("ha"), col("hb"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  // --------------------------------------------------------------------
  // Audio perceptual-fingerprint near-dup (q278): frame-energy deltas
  // --------------------------------------------------------------------

  /** Docs planted as near-duplicate AUDIO twins: every `doc_id ≡ 5
    * (mod 19)` carries a gain-perturbed RE-ENCODE of `doc_id - 1`'s
    * audio — decode the neighbour's actual WAV bytes, scale every
    * sample to v − (v >> 4) (a ~15/16 gain ride, the arithmetic shift
    * both Spark and the oracle floor identically), encode again. A
    * uniform gain change scales every frame's mean energy together, so
    * the sign-of-delta fingerprint moves only where adjacent frames sat
    * within the floor noise — a few bits, the audio analogue of q277's
    * brightness wrap.
    */
  private[graft] def plantedAudioTwin(docId: Long): Boolean =
    docId >= 1 && docId % 19 == 5

  /** Deterministic synthetic "chiptune" for q278 — two fast-wrapping
    * ramp components summed mod 2¹⁶. q72's [[syntheticWav]] is a single
    * slope-17 ramp that wraps at most once in ≤767 samples, so its
    * |amplitude| contour is one V shape: ~12 bits of fingerprint
    * entropy, and at 500 docs everything near-matches everything (the
    * first q278 cut measured 3 964 "pairs" at sf0.01). The two
    * components here wrap every ~4.7 and ~2.1 samples, the waveform is
    * determined by the PHASE PAIR (2³² distinct clips), and the
    * frame-mean deltas are effectively random signs — natural cross-doc
    * collisions at Hamming ≤ 10 price out at ~2⁻²⁸ per candidate.
    * Still a REAL RIFF/WAVE round trip and fully closed-form for the
    * oracle.
    */
  private[graft] def syntheticChipWav(docId: Long): Array[Byte] = {
    val n = (256 + docId % 512).toInt
    val p1 = (docId * 25173) % 65536
    val p2 = (docId * 12289) % 65536
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val v = (((p1 + t.toLong * 13849) % 65536 +
        (p2 + t.toLong * 31397) % 65536) % 65536 - 32768).toInt
      pcm(2 * t) = (v & 0xff).toByte
      pcm(2 * t + 1) = ((v >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 16, 1, /* signed = */ true, /* bigEndian = */ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    wavWriterProvider.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private[graft] def decodeWavSamples(payload: Array[Byte]): Array[Int] = {
    val ais = wavReaderProvider.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"unexpected decoded format: $fmt")
    val bytes = ais.readAllBytes()
    val out = new Array[Int](bytes.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
      i += 1
    }
    out
  }

  private[graft] def syntheticWavWithTwins(docId: Long): Array[Byte] =
    if (!plantedAudioTwin(docId)) syntheticChipWav(docId)
    else {
      val samples = decodeWavSamples(syntheticChipWav(docId - 1))
      val n = samples.length
      val pcm = new Array[Byte](n * 2)
      var t = 0
      while (t < n) {
        val v = samples(t) - (samples(t) >> 4)
        pcm(2 * t) = (v & 0xff).toByte
        pcm(2 * t + 1) = ((v >> 8) & 0xff).toByte
        t += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        8000f, 16, 1, /* signed = */ true, /* bigEndian = */ false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      wavWriterProvider.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

  /** 64-bit audio fingerprint over DECODED PCM: 65 equal-boundary
    * frames (frame f spans t ∈ [⌊f·n/65⌋, ⌊(f+1)·n/65⌋), the q277 cell
    * formula), per-frame mean ABSOLUTE amplitude with integer floors,
    * bit f set iff frame(f+1) > frame(f) — the sign-of-delta contour a
    * production chromaprint reduces to once the spectral transform is
    * stripped. Length-normalized (any n collapses to 65 frames) and
    * gain-robust (uniform scaling preserves most deltas) — the two
    * axes audio re-encodes actually move.
    */
  private[graft] def audioFp64(samples: Array[Int]): Long = {
    val n = samples.length
    val sums = new Array[Long](65)
    val cnts = new Array[Long](65)
    var t = 0
    while (t < n) {
      val f = (65 * t + 64) / n
      sums(f) += math.abs(samples(t))
      cnts(f) += 1
      t += 1
    }
    var hash = 0L
    var f = 0
    while (f < 64) {
      if (sums(f + 1) / cnts(f + 1) > sums(f) / cnts(f)) hash |= 1L << f
      f += 1
    }
    hash
  }

  private val afpSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("afp", LongType),
  ))

  /** Per-doc audio fingerprint through the REAL codec path: synthesize
    * (or twin-perturb + re-encode) the WAV, decode it with
    * javax.sound.sampled, fingerprint the decoded PCM — one task, no
    * payload shuffle.
    */
  def audioFps(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val ids = docs.select(("doc_id" +: carry).map(col): _*)
    val schema = StructType(
      afpSchema.fields.toSeq ++ carry.map(c => docs.schema(c)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    ids.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(0)
        Row.fromSeq(id +: audioFp64(decodeWavSamples(syntheticWavWithTwins(id))) +:
          (1 until r.length).map(r.get))
      }
    }(enc)
  }

  /** Audio near-duplicate pairs (q278): the q277 pipeline pointed at
    * the audio fingerprints — gain-rides and re-encodes of the SAME
    * recording land within a few bits; candidates ride the identical
    * bounded Hamming-band join (see [[hammingBandedPairs]]). With q277
    * this closes the perceptual-dedup story for both binary modalities
    * the container can really decode.
    */
  def audioFpDups(s: SparkSession, dir: String): DataFrame =
    audioFpDups(Tables.documents(s, dir))

  def audioFpDups(docs: DataFrame, maxHamming: Int = 4,
      window: Int = 8): DataFrame =
    graft.Derived.materialized(docs.sparkSession,
      s"audio_fp_pairs_h${maxHamming}_w$window", Seq(docs)) {
      audioFpDupsInline(docs, maxHamming, window)
    }

  private[graft] def audioFpDupsInline(docs: DataFrame, maxHamming: Int = 4,
      window: Int = 8): DataFrame =
    hammingBandedPairs(audioFps(docs), "afp", maxHamming, window)

  // --------------------------------------------------------------------
  // Audio VAD / silence segmentation (q284)
  // --------------------------------------------------------------------

  /** Deterministic synthetic "speech" WAV: 64-sample windows gate
    * between LOUD (the q278 two-ramp chip waveform, mean |amp| ≈ 16 k)
    * and NEAR-SILENCE (a 7-bit ripple, mean |amp| ≈ 32) by a
    * per-(doc, window) hash — the voiced/pause alternation a speech
    * recording actually has, with run lengths that vary across docs.
    * Real RIFF/WAVE round trip; the gate and both waveforms are
    * closed-form for the oracle.
    */
  private[graft] def syntheticSpeechWav(docId: Long): Array[Byte] = {
    val n = (512 + docId % 512).toInt
    val p1 = (docId * 25173) % 65536
    val p2 = (docId * 12289) % 65536
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val w = t / 64
      val v =
        if ((docId * 31 + w.toLong * 17) % 5 >= 2)
          (((p1 + t.toLong * 13849) % 65536 +
            (p2 + t.toLong * 31397) % 65536) % 65536 - 32768).toInt
        else ((p1 + t.toLong * 13849) % 128 - 64).toInt
      pcm(2 * t) = (v & 0xff).toByte
      pcm(2 * t + 1) = ((v >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 16, 1, /* signed = */ true, /* bigEndian = */ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    wavWriterProvider.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Energy-threshold voice-activity segmentation over decoded PCM:
    * window w's energy is the integer mean |amplitude| over its ≤ `win`
    * samples; a window is VOICED iff energy ≥ `threshold`; maximal
    * voiced runs are the segments. Returns (n_windows, voiced_windows,
    * n_segments, longest_voiced) — the per-clip trim/keep stats a
    * speech-data curation pass gates on (silence share, fragmentation).
    */
  private[graft] def vadStats(samples: Array[Int], win: Int = 64,
      threshold: Long = 4096L): (Long, Long, Long, Long) = {
    val nw = (samples.length + win - 1) / win
    var w = 0
    var voiced = 0L
    var segs = 0L
    var longest = 0L
    var run = 0L
    while (w < nw) {
      var s = 0L
      var c = 0L
      var t = w * win
      val end = math.min(samples.length, (w + 1) * win)
      while (t < end) { s += math.abs(samples(t)); c += 1; t += 1 }
      if (s / c >= threshold) {
        voiced += 1; run += 1
        if (run == 1L) segs += 1
        if (run > longest) longest = run
      } else run = 0L
      w += 1
    }
    (nw.toLong, voiced, segs, longest)
  }

  private val vadSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_windows", LongType),
    StructField("voiced_windows", LongType),
    StructField("n_segments", LongType),
    StructField("longest_voiced", LongType),
    StructField("voiced_ratio_micro", LongType),
  ))

  /** Audio VAD segmentation (q284): synthesize (or ingest) the clip,
    * decode through the REAL javax.sound codec, segment voiced/silent
    * runs — all inside one task per clip. The curation signal for a
    * 100 TB speech corpus: clips that are mostly silence, or shredded
    * into many short bursts, are trimmed or dropped before training.
    *
    * Scale: codec + segmentation are row-local (the whole clip is one
    * task row; the run-length loop lives inside the kernel, not in a
    * window) — ZERO shuffles end to end, output one row per clip.
    */
  def audioVad(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val ids = docs.select(("doc_id" +: carry).map(col): _*)
    val schema = StructType(
      vadSchema.fields.toSeq ++ carry.map(c => docs.schema(c)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    ids.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(0)
        val (nw, v, segs, longest) =
          vadStats(decodeWavSamples(syntheticSpeechWav(id)))
        Row.fromSeq(Seq(id, nw, v, segs, longest, 1000000L * v / nw) ++
          (1 until r.length).map(r.get))
      }
    }(enc)
  }

  def audioVad(s: SparkSession, dir: String): DataFrame =
    audioVad(Tables.documents(s, dir))

  // --------------------------------------------------------------------
  // Clip-level video near-dup (q281): scene-keyframe signature sets
  // --------------------------------------------------------------------

  /** Docs planted as near-duplicate VIDEO twins: every `doc_id ≡ 7
    * (mod 23)` carries a TRIMMED, brightness-ridden RE-ENCODE of
    * `doc_id - 1`'s clip — decode the neighbour's actual GIF bytes, drop
    * frame 0, add +2 per pixel with mod-256 wrap, encode again. Trim +
    * re-encode is the clip-twin class a 100 TB video curation pass
    * actually hunts (the same footage re-cut and re-compressed); the
    * wrap flips a few fingerprint bits per keyframe (the q277
    * brightness-wrap discipline) so the match is NEAR, not exact, while
    * staying fully closed-form for the oracle.
    */
  private[graft] def plantedClipTwin(docId: Long): Boolean =
    docId >= 1 && docId % 23 == 7

  /** Per-frame pixel of the q281 clip family. [[syntheticClipGif]]'s
    * scenes differ across docs only by an ADDITIVE constant, and the
    * sign-of-delta fingerprint is brightness-invariant by design — under
    * it every doc's scene-p frames would near-collide with every other
    * doc's (the q278 single-ramp entropy trap, measured at 3 964 false
    * "pairs"). Linear and quadratic per-(doc, scene) gradients were
    * simulated and REJECTED too: any affine ramp gives per-row sign
    * bias (~16 effective fingerprint bits → 46 811 false band pairs at
    * 5 000 docs), and x² mod p of a ramp is palindromic around its
    * vertex. What survives is a per-pixel multiply–xorshift–multiply
    * hash seeded on (docId, scene) — the xor between Lehmer steps
    * breaks linearity, so cross-doc fingerprints are effectively
    * uniform 63-bit values (simulated: 0 false pairs / 218 planted
    * found at 5 000 docs) while within-scene drift (+3/frame) and the
    * twin ride (+2) flip only wrap-straddling pixels. Every operation
    * is closed-form BIGINT arithmetic the DuckDB oracle replays
    * verbatim (all intermediates < 2⁶³).
    */
  private[graft] def clipPixel(docId: Long, f: Int, x: Int, y: Int): Int = {
    val i = y * 8 + x
    val p = f / 3
    val s0 = (docId * 2654435761L + p * 40503L) % 2147483648L
    val seed = (s0 * 48271L) % 2147483647L
    var v = (seed + (i + 1) * 69621L) % 2147483647L
    v = (v * 16807L) % 2147483647L
    v = v ^ (v >> 16)
    v = (v * 48271L) % 2147483647L
    ((v % 256 + 3L * f) % 256).toInt
  }

  private[graft] def syntheticVideoClip(docId: Long): Array[Byte] =
    writeGifSequence((2 + docId % 7).toInt)((f, x, y) =>
      clipPixel(docId, f, x, y))

  private[graft] def syntheticVideoWithTwins(docId: Long): Array[Byte] =
    if (!plantedClipTwin(docId)) syntheticVideoClip(docId)
    else {
      val frames = decodeGifGray(syntheticVideoClip(docId - 1))
      writeGifSequence(frames.length - 1)((f, x, y) =>
        (frames(f + 1)(y * 8 + x) + 2) % 256)
    }

  /** REAL multi-frame decode to row-major 8×8 gray rasters, resources
    * released in try/finally. */
  private[graft] def decodeGifGray(payload: Array[Byte]): IndexedSeq[Array[Int]] = {
    val reader = gifReaderTL.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      (0 until reader.getNumImages(true)).map(f => grayRaster8(reader.read(f)))
    } catch { case e: Throwable =>
      reader.dispose(); gifReaderTL.remove(); throw e
    } finally {
      try reader.setInput(null) catch { case _: Throwable => () }
      iis.close()
    }
  }

  private val clipSigSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("scene", IntegerType),
    StructField("fp", LongType),
    StructField("n_scenes", IntegerType),
  ))

  /** Per-clip scene-keyframe signature set, PARTITION-LOCAL: decode the
    * clip, fingerprint every frame, apply the q279 cut rule (frame 0 or
    * Hamming-to-previous > 8 opens a scene) INSIDE the kernel, and emit
    * one row per keyframe. Unlike [[sceneCuts]] — whose per-frame output
    * is the point, so it rides a doc_id window — the signature pass
    * needs no shuffle at all: the whole clip sits in one task row, so
    * cut detection is a local loop and only ≤ ⌈8/3⌉ signature rows per
    * clip leave the scan.
    */
  /** The q279 cut rule over a frame-fp sequence: keyframe iff frame 0 or
    * Hamming-to-previous > 8. */
  private[graft] def keyframeFps(fps: IndexedSeq[Long]): Vector[Long] = {
    val kf = Vector.newBuilder[Long]
    var prev = 0L
    var f = 0
    while (f < fps.length) {
      if (f == 0 || java.lang.Long.bitCount(fps(f) ^ prev) > 8)
        kf += fps(f)
      prev = fps(f)
      f += 1
    }
    kf.result()
  }

  def clipSignatures(docs: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(clipSigSchema)
    ids.mapPartitions { rows: Iterator[Row] =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        val sig = keyframeFps(
          decodeGifGray(syntheticVideoWithTwins(id)).map(frameFp63))
        sig.zipWithIndex.map { case (fp, s) => Row(id, s, fp, sig.size) }
      }
    }(enc)
  }

  private val clipPackSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("fps", ArrayType(LongType, containsNull = false)),
    StructField("n", IntegerType),
  ))

  /** One row per clip: the sorted scene-keyframe fingerprint array and
    * its size — the verify-side relation of [[clipDups]] and the
    * streaming clip-dup monitor, emitted STRAIGHT FROM THE KERNEL (no
    * groupBy/collect_list shuffle: the clip already sits whole in one
    * task row, so aggregating its own keyframes through an exchange
    * would be a corpus-scaled shuffle for nothing).
    */
  def clipSignaturePacks(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val ids = docs.select(("doc_id" +: carry).map(col): _*)
    val schema = StructType(
      clipPackSchema.fields.toSeq ++ carry.map(c => docs.schema(c)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    ids.mapPartitions { rows: Iterator[Row] =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val sig = keyframeFps(
          decodeGifGray(syntheticVideoWithTwins(id)).map(frameFp63))
        Row.fromSeq(id +: sig.sorted +: sig.size +: (1 until r.length).map(r.get))
      }
    }(enc)
  }

  /** Clip-level video near-duplicate pairs (q281): the operator a 100 TB
    * video curation pass runs AFTER segmentation — q279 finds the scene
    * keyframes, this dedups whole clips by them. A clip's signature is
    * its scene-keyframe fingerprint SET (order-free: a re-cut that drops
    * leading frames shifts every frame index but leaves interior scene
    * fingerprints in place); candidates come from the same bounded
    * 4×16-bit Hamming-band join as q277/q278 applied to EVERY signature
    * member (a pair is considered iff SOME keyframe band matches — at
    * most ~3 keyframes per clip, so the band relation is 3× the corpus,
    * still linear); the verify is a SET-OVERLAP test on the two
    * signature arrays (≤ 3×3 codegen'd bit_counts per candidate):
    * `matched` counts keyframes of a within `maxHamming` of some
    * keyframe of b, and a pair survives iff at least half the LARGER
    * signature matched — a trim can drop a whole scene without losing
    * the pair, but two clips sharing one incidental scene of many do
    * not collapse.
    *
    * Scale: signature extraction is codec-linear and shuffle-free; the
    * band join is the plan-pinned bounded-window shape (never in-bucket
    * n²); the verify joins only candidate pairs to the ≤-3-row-per-doc
    * signature packs — everything downstream of the scan scales with
    * the dup rate, not the corpus.
    */
  def clipDups(s: SparkSession, dir: String): DataFrame =
    clipDups(Tables.documents(s, dir))

  def clipDups(docs: DataFrame, maxHamming: Int = 10,
      window: Int = 8): DataFrame =
    graft.Derived.materialized(docs.sparkSession,
      s"clip_pairs_h${maxHamming}_w$window", Seq(docs)) {
      clipDupsInline(docs, maxHamming, window)
    }

  private[graft] def clipDupsInline(docs: DataFrame, maxHamming: Int = 10,
      window: Int = 8): DataFrame = {
    val packs = graft.Caches.track(clipSignaturePacks(docs))
    val bands = packs
      .select(col("doc_id"), explode(col("fps")).as("fp"))
      .select(col("doc_id"), col("fp"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("fp"), 16 * b).bitwiseAND(lit(65535L))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "k")
    // rank within the (band, key) bucket by (doc_id, fp) — docs appear
    // once per keyframe, so the tiebreak keeps row_number deterministic
    val ranked = graft.Caches.track(bands.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("k"))
        .orderBy(col("doc_id"), col("fp")))))
    val probes = ranked.select(col("band"), col("k"),
      col("doc_id").as("doc_a"),
      explode(array((1 to window).map(j => col("rn") + j): _*)).as("rn"))
    val cand = probes.hint("shuffle_hash")
      .join(ranked.select(col("band"), col("k"), col("rn"),
          col("doc_id").as("doc_b")).hint("shuffle_hash"),
        Seq("band", "k", "rn"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    cand
      .join(packs.select(col("doc_id").as("doc_a"),
        col("fps").as("fps_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(packs.select(col("doc_id").as("doc_b"),
        col("fps").as("fps_b"), col("n").as("n_b")), Seq("doc_b"))
      .withColumn("matched", expr(
        s"size(filter(fps_a, fa -> exists(fps_b, fb -> bit_count(fa ^ fb) <= $maxHamming)))"))
      .filter(col("matched") * 2 >= greatest(col("n_a"), col("n_b")))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        col("matched"))
  }

  /** Multimodal dup-evidence fusion (q280): the decision table a
    * curation pipeline reads BEFORE deleting — one row per candidate
    * pair carrying every modality's verdict, because deleting on a
    * single perceptual signal is how false-positive dedup eats real
    * data. Joins the image (q277), audio (q278), and video-clip (q281)
    * near-dup verdicts FULL OUTER on the pair key: high-`n_modalities`
    * pairs are the safe-to-collapse population, single-signal pairs go
    * to review. Absent verdicts surface as -1 (not null) so the table
    * is hash-stable across engines.
    *
    * Scale: all three inputs are dup-bounded pair sets (each already
    * band-bucketed and window-capped upstream), so the fusion joins
    * shuffle only confirmed near-dup pairs — they scale with the dup
    * rate, never the corpus.
    */
  def dupEvidence(s: SparkSession, dir: String): DataFrame =
    dupEvidence(Tables.documents(s, dir))

  def dupEvidence(docs: DataFrame): DataFrame = {
    val img = imageDHashDups(docs)
      .select(col("doc_a"), col("doc_b"), col("hamming").as("ih"))
    val aud = audioFpDups(docs)
      .select(col("doc_a"), col("doc_b"), col("hamming").as("ah"))
    val vid = clipDups(docs)
      .select(col("doc_a"), col("doc_b"), col("matched").as("vm"))
    img.join(aud, Seq("doc_a", "doc_b"), "full_outer")
      .join(vid, Seq("doc_a", "doc_b"), "full_outer")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("ih"), lit(-1)).as("img_hamming"),
        coalesce(col("ah"), lit(-1)).as("aud_hamming"),
        coalesce(col("vm"), lit(-1)).as("vid_matched"),
        (col("ih").isNotNull.cast("int") + col("ah").isNotNull.cast("int") +
          col("vm").isNotNull.cast("int")).as("n_modalities"))
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with typed
  * metadata, processed per-partition in bounded batches.
  *
  * IMAGE decode and resize are REAL ([[decodeImageMeta]]/[[resizeImage]]:
  * javax.imageio — JDK-standard, PNG/JPEG/BMP/GIF). AUDIO header decode is
  * REAL ([[decodeAudioMeta]]: javax.sound.sampled, WAV/AIFF/AU). VIDEO
  * container metadata is REAL ([[decodeVideoMeta]]: a hand-rolled ISO BMFF
  * box walker — pure JDK), and codec-level video FRAME decode is REAL for
  * MJPEG-in-AVI ([[decodeVideoFrames]]: RIFF `movi` walker + per-frame
  * javax.imageio JPEG decode — MJPEG frames are standalone JPEGs). Codec
  * IDENTITY for inter-frame codecs is reported from the container's
  * `stsd` sample entry (avc1/hev1/mp4v/vp09/av01 — no decoder needed to
  * classify an H.264 corpus); only their frame DECODE stays out of scope
  * (this container ships no such codecs), and the deterministic
  * [[stubDecode]] remains solely as the tagged fallback for unparseable
  * payloads. The Spark-side
  * plumbing — schema, encoder, partition-batched processing, metadata
  * extraction — is identical in real and fallback paths, so plugging a
  * JNI/javacv decoder for those codecs keeps every plan shape intact.
  */
object Multimodal {

  // ImageIO's default stream cache backs every read/write with a TEMP FILE;
  // at thousands of small in-memory payloads per partition the file churn
  // costs more than the codec work itself. All payloads here are byte
  // arrays — cache in memory. (Object init runs once per executor JVM.)
  javax.imageio.ImageIO.setUseCache(false)

  // javax.sound providers, resolved ONCE per JVM (round 18, the mm sf1
  // finding's second half): unlike ImageIO's static registry,
  // `AudioSystem.getAudioInputStream/getAudioFileFormat/write` re-resolve
  // their SPI providers through the calling thread's context classloader
  // on effectively every call — under Spark task threads that is a
  // classpath service scan per ROW (~4.5 ms against a 300-jar classpath;
  // measured 677 s of summed task time for a 50k-row downsample whose
  // actual codec work microbenchmarks at ~2 s). The spi package is
  // public API and the providers here are the same JDK WAV/AIFF/AU
  // implementations AudioSystem itself would pick, so decode semantics
  // are identical — only the per-call registry walk is gone.
  private lazy val audioReaders: Vector[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader],
      classOf[javax.sound.sampled.AudioSystem].getClassLoader)
      .iterator().asScala.toVector
  }
  private lazy val audioWriters: Vector[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter],
      classOf[javax.sound.sampled.AudioSystem].getClassLoader)
      .iterator().asScala.toVector
  }

  // The reader that recognized the LAST payload, tried first on the
  // next one: the providers reject foreign formats by THROWING
  // UnsupportedAudioFileException, and exception construction pays
  // fillInStackTrace against the ~100-frame Spark task stack — wrong
  // readers first means milliseconds per row on a homogeneous corpus
  // (the dominant term left after the registry fix; plain-thread
  // microbenches hid it behind their 10-frame stacks). Plain volatile:
  // a race just costs one extra miss.
  @volatile private var lastAudioReader: javax.sound.sampled.spi.AudioFileReader = null

  // The sticky shortcut is DISABLED when any non-JDK reader is installed
  // (round-19 advisor fix): JDK readers recognize disjoint format
  // families (WAV/AU/AIFF magics), so trying the last winner first can
  // never pick a different reader than AudioSystem's registration-order
  // scan. A third-party SPI jar may recognize payloads a JDK reader also
  // recognizes — sticky-first would then make decode metadata row-order
  // dependent, so those classpaths take the deterministic full scan and
  // keep only the once-per-JVM registry pinning.
  private lazy val stickyReaderSafe: Boolean =
    audioReaders.forall(_.getClass.getName.startsWith("com.sun.media.sound."))

  private def firstRecognizing[T](payload: Array[Byte])
      (read: (javax.sound.sampled.spi.AudioFileReader, java.io.ByteArrayInputStream) => T): T = {
    val lr = if (stickyReaderSafe) lastAudioReader else null
    if (lr != null) {
      try return read(lr, new java.io.ByteArrayInputStream(payload))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    val it = audioReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      if (r ne lr) {
        try {
          val v = read(r, new java.io.ByteArrayInputStream(payload))
          lastAudioReader = r
          return v
        } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
      }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no installed reader recognizes the payload")
  }

  /** `AudioSystem.getAudioInputStream` minus the per-call registry walk
    * and the wrong-readers-throw-first scan (see [[lastAudioReader]]);
    * recognition semantics identical to the AudioSystem contract.
    */
  private def audioStreamOf(payload: Array[Byte]): javax.sound.sampled.AudioInputStream =
    firstRecognizing(payload)(_.getAudioInputStream(_))

  /** `AudioSystem.getAudioFileFormat`, same treatment. */
  private def audioFormatOf(payload: Array[Byte]): javax.sound.sampled.AudioFileFormat =
    firstRecognizing(payload)(_.getAudioFileFormat(_))

  /** `AudioSystem.write(…, WAVE, …)` minus the per-call registry walk. */
  private def writeWave(ais: javax.sound.sampled.AudioInputStream,
                        out: java.io.OutputStream): Unit = {
    val t = javax.sound.sampled.AudioFileFormat.Type.WAVE
    audioWriters.find(_.isFileTypeSupported(t, ais)) match {
      case Some(w) => w.write(ais, t, out): Unit
      case None => throw new IllegalArgumentException(
        "no installed writer supports WAVE for this stream")
    }
  }

  final case class MediaFile(media_id: Long, kind: String, payload: Array[Byte])
  final case class DecodedMeta(media_id: Long, kind: String, n_bytes: Int,
                               width: Int, height: Int, checksum: Long)
  final case class Frame(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * A real implementation would parse the container header instead. The
    * checksum is a polynomial hash mod 1e9+7 — modular (never overflows
    * int64), so any SQL engine can replay it exactly over the byte codes
    * and the stub path gets a real value-level oracle, not a row count.
    */
  private def stubDecode(m: MediaFile): DecodedMeta = {
    var crc = 0L
    var i = 0
    while (i < m.payload.length) {
      crc = (crc * 31 + (m.payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    DecodedMeta(m.media_id, m.kind, m.payload.length,
      width = 16 + (crc % 1024).toInt,
      height = 16 + ((crc / 7) % 1024).toInt,
      checksum = crc)
  }

  /** The skinny id column, spread to full parallelism BEFORE per-row
    * codec work (round 18, the mm sf1 finding): the synthesize/decode
    * chains hang orders-of-magnitude-per-byte CPU work (ImageIO
    * encode/decode, WAV resample) off a scan whose partitioning Spark
    * sized by PARQUET BYTES — a few KB of doc ids is 1-3 file splits,
    * so the whole mm family ran on 1-3 of 32 cores and scaled with the
    * file-split count instead of the machine (sf1: 7-13x for 10x rows).
    * One tiny shuffle of longs buys work-proportional parallelism. A
    * real binary corpus does NOT reliably arrive wide on its own
    * (measured, round 19): `binaryFile` over-splits small files (~one
    * per partition, the openCostInBytes padding) but can under-split
    * large-file corpora of modest total bytes — [[mediaFromDirectory]]
    * makes the equivalent spread decision there from the scan's actual
    * partition count.
    */
  private def spreadIds(df: DataFrame, idCol: String)
                       (implicit enc: org.apache.spark.sql.Encoder[Long]): Dataset[Long] =
    df.select(col(idCol).cast("long").as("media_id")).as[Long]
      .repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** REAL binary-file ingestion (round 19): a directory of media files →
    * the engine's `(media_id, kind, payload)` frame, via Spark's
    * `binaryFile` source (path, modificationTime, length, content).
    * Every decode/fingerprint/near-dup operator in this object consumes
    * the result exactly as it consumes the synthesized frames.
    *
    *  - '''media_id''': the first digit run in the file's basename
    *    (`img_00042.png` → 42 — the layout a corpus export writes) when
    *    it fits a long (≤ 18 digits), else a 63-bit hash of the full
    *    path. Pure codegen (`regexp_extract` + `xxhash64`),
    *    deterministic across runs. Layouts whose leading digits are NOT
    *    ids (date prefixes, hex hashes) should pass `parseIds = false`
    *    for collision-free path-hash ids.
    *  - '''kind''': by extension — image (png/jpg/jpeg/bmp/gif), audio
    *    (wav/aif/aiff/au/snd), video (avi/mp4/mov/m4v), else `binary`.
    *  - '''partitioning''' (measured, round 19 — the claim `spreadIds`
    *    left untested): `binaryFile` is NOT a fixed many-files-per-split
    *    packer at small scale. Split size is
    *    `min(maxPartitionBytes, max(openCostInBytes, totalBytes /
    *    defaultParallelism))`, and each file is padded by
    *    `openCostInBytes` (4 MB default) during packing — so a
    *    small-file corpus lands ~one file per partition (over-split, not
    *    under-split), while a corpus of files much larger than 4 MB
    *    packs toward `maxPartitionBytes` bins and can under-split to
    *    fewer partitions than cores when total bytes are modest. Neither
    *    shape is reliably work-proportional for per-row codec cost, so
    *    when the scan yields FEWER partitions than
    *    `defaultParallelism`, the payloads are repartitioned once —
    *    by construction the corpus is small in bytes exactly when that
    *    happens, so the shuffle is cheap relative to the codec work it
    *    parallelizes (the same trade `spreadIds` makes, here on measured
    *    evidence; see MultimodalSpec's partition assertions). A corpus
    *    already at or above core-count partitions passes through
    *    untouched — no shuffle on the 100 TB path.
    */
  def mediaFromDirectory(spark: SparkSession, dir: String,
                         glob: String = "",
                         parseIds: Boolean = true): DataFrame = {
    val reader = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
    val raw = (if (glob.nonEmpty) reader.option("pathGlobFilter", glob)
               else reader).load(dir)
    val base = regexp_extract(col("path"), "([^/]+)$", 1)
    val digits = regexp_extract(base, "([0-9]+)", 1)
    val ext = lower(regexp_extract(base, "\\.([A-Za-z0-9]+)$", 1))
    // digit-run ids: only when the run FITS in a long (a 20-digit
    // content-hash name would cast to NULL under non-ANSI and crash
    // every as[MediaFile] consumer on the non-nullable field — round-19
    // review); runs longer than 18 digits take the path hash. The
    // digit-run heuristic can still COLLIDE on layouts whose leading
    // digits aren't ids (date-prefixed names) — corpora like that
    // should pass parseIds = false and get collision-free path hashes.
    val media = raw.select(
      when(lit(parseIds) && digits =!= "" && length(digits) <= 18,
          digits.cast("long"))
        .otherwise(pmod(xxhash64(col("path")), lit(Long.MaxValue)))
        .as("media_id"),
      when(ext.isin("png", "jpg", "jpeg", "bmp", "gif"), "image")
        .when(ext.isin("wav", "aif", "aiff", "au", "snd"), "audio")
        .when(ext.isin("avi", "mp4", "mov", "m4v"), "video")
        .otherwise("binary").as("kind"),
      col("content").as("payload"))
    val scanParts = media.rdd.getNumPartitions
    val cores = spark.sparkContext.defaultParallelism
    if (scanParts < cores) media.repartition(cores) else media
  }

  /** Synthesize a media table from any (id, text) table — payload = UTF-8
    * bytes, kind round-robins image/audio/video. Stands in for a real
    * binary source ([[mediaFromDirectory]]) where no files exist.
    */
  def synthesizeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      col(textCol).cast("binary").as("payload"))

  /** Decode / feature-extract over partitions: the per-partition iterator
    * keeps memory bounded (one payload at a time), the narrow map keeps
    * the operator shuffle-free and partition-parallel.
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions(_.map(stubDecode))
  }

  /** Frame sampling plumbing for video payloads: emits every `stride`-th
    * fixed-size slice of the payload as a "frame" (stub for codec-level
    * frame extraction). flatMap keeps it narrow; output size is bounded by
    * payload/frameBytes/stride per row.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 64, stride: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaFile].flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, idx) => Frame(m.media_id, idx, chunk) }
    }
  }

  /** "Resize" plumbing: truncate/pad payload to a target byte budget —
    * stands in for image resize while exercising binary-column transforms
    * in pure SQL functions (substr on binary stays in codegen).
    */
  def resizePayload(media: DataFrame, targetBytes: Int): DataFrame =
    media.withColumn("payload_resized",
      substring(col("payload"), 1, targetBytes))
      .withColumn("resized_bytes", length(col("payload_resized")))

  final case class ImageMeta(media_id: Long, n_bytes: Int, width: Int,
                             height: Int, channels: Int, codec: String)

  /** Full pixel decode, or null when no reader recognizes the payload.
    * Routing every executor-side read through this method also guarantees
    * the object initializer (memory-cached streams) has run there.
    */
  private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    catch { case _: Exception => null }

  /** HEADER-ONLY metadata parse: ask the format reader for dimensions and
    * the native image type without decoding pixels — at metadata-extraction
    * scale (billions of thumbnails) the pixel decode is pure waste. Returns
    * null when no installed reader recognizes the payload.
    */
  private def readHeader(payload: Array[Byte]): ImageMeta =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            val types = r.getImageTypes(0)
            val channels =
              if (types.hasNext) types.next().getColorModel.getNumComponents else 0
            ImageMeta(0L, payload.length, r.getWidth(0), r.getHeight(0),
              channels, "imageio")
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => null }

  /** Synthesize REAL encoded PNG payloads (javax.imageio, JDK-standard —
    * no external codec dependency): one grayscale image per row with
    * dimensions derived arithmetically from the id
    * (`width = 1 + id % 16`, `height = 1 + id % 9`), so a SQL oracle can
    * predict exactly what a real decoder must recover. The encode runs in
    * the same bounded mapPartitions batch shape as production ingest.
    */
  def synthesizeImages(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spreadIds(df, idCol)
      .mapPartitions(_.map { id =>
        val w = 1 + (id % 16).toInt
        val h = 1 + (id % 9).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.getRaster.setSample(x, y, 0, (id + x + y) % 256); x += 1 }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        MediaFile(id, "image", baos.toByteArray)
      })
      .toDF()
  }

  /** REAL image decode: parse the payload with javax.imageio (PNG/JPEG/
    * BMP/GIF via the JDK's built-in readers) and emit actual dimensions
    * and channel count — HEADER-ONLY, no pixel decode ([[readHeader]]);
    * payloads no reader recognizes fall back to the deterministic stub
    * dimensions, tagged `codec = "stub"`. Same bounded mapPartitions
    * batch shape as [[decodeMeta]].
    */
  def decodeImageMeta(spark: SparkSession, media: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions(_.map { m =>
      val meta = readHeader(m.payload)
      if (meta != null) meta.copy(media_id = m.media_id)
      else {
        val s = stubDecode(m)
        ImageMeta(m.media_id, s.n_bytes, s.width, s.height, 0, "stub")
      }
    })
  }

  /** REAL image resize: decode, rescale to `targetW` x `targetH`
    * (bilinear), re-encode as PNG. Non-decodable payloads fall back to
    * the byte-truncation stub. Narrow map, codec work bounded per row.
    */
  def resizeImage(spark: SparkSession, media: DataFrame,
                  targetW: Int, targetH: Int): Dataset[MediaFile] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions(_.map { m =>
      val img = readImage(m.payload)
      if (img != null) {
        val out = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
        g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        MediaFile(m.media_id, m.kind, baos.toByteArray)
      } else
        MediaFile(m.media_id, m.kind, m.payload.take(targetW * targetH))
    })
  }

  /** Dimensions of the [[synthesizeNearDupImages]] fixtures: chosen so the
    * [[dHash]] 9×8 sample grid lands on exact integer strides (18/9 = 2,
    * 16/8 = 2) — every sampled pixel is arithmetically predictable, so a
    * SQL oracle can recompute the fingerprint a REAL decoder must produce.
    */
  val NearDupW = 18
  val NearDupH = 16

  /** The near-dup fixture's pixel formula — the single source of truth
    * shared by the synthesizer, the spec, and the oracle-SQL builder.
    * Quadratic + cross terms so neighbor comparisons vary richly with the
    * group (unrelated groups land ~32 bits apart); variant v=1 perturbs
    * only pixel (0,0), so paired images differ in AT MOST the one
    * fingerprint bit that samples it.
    *
    * The group enters through THREE base-256 digits with independent
    * (x, y) coefficient planes — not `g · a % 256`, whose pattern
    * depends on g mod 256 only, so a ≥256-group corpus would alias
    * into ≤256 identical fingerprints and every soak past that size
    * measured quadratic TRUE-dup cliques instead of the band join
    * (the round-14 re-diagnosis of the `video_fingerprint_pairs`
    * "birthday term"). Digit mixing keeps ~16M distinct patterns;
    * for g < 256 the high digits vanish and the formula equals the
    * original. DuckDB replays `//`/`%` exactly (g is non-negative).
    */
  def nearDupPixel(g: Long, v: Long, x: Int, y: Int): Int =
    (((g % 256) * (53 + 11 * x + 13 * y) +
      ((g / 256) % 256) * (19 + 7 * x + 17 * y) +
      ((g / 65536) % 256) * (23 + 29 * x + 3 * y) +
      (3 * x * x + 5 * y * y + 7 * x * y) +
      (if (v == 1 && x == 0 && y == 0) 200L else 0L)) % 256).toInt

  /** Synthesize REAL encoded PNG pairs for perceptual near-dup testing:
    * ids 2g and 2g+1 render the same [[nearDupPixel]] pattern, the odd
    * variant with a single perturbed pixel — perceptually identical;
    * different groups g are unrelated patterns. Same bounded
    * mapPartitions batch shape as [[synthesizeImages]].
    */
  def synthesizeNearDupImages(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spreadIds(df, idCol)
      .mapPartitions(_.map { id =>
        val (g, v) = (id / 2, id % 2)
        val img = new java.awt.image.BufferedImage(
          NearDupW, NearDupH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        var y = 0
        while (y < NearDupH) {
          var x = 0
          while (x < NearDupW) {
            img.getRaster.setSample(x, y, 0, nearDupPixel(g, v, x, y)); x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        MediaFile(id, "image", baos.toByteArray)
      })
      .toDF()
  }

  final case class ImageHash(media_id: Long, dhash: String, codec: String)

  /** Perceptual difference hash (dHash): decode, AREA-AVERAGE the band-0
    * pixels onto a 9×8 grid — cell (x, y) is the mean of the box
    * `[x·w/9, (x+1)·w/9) × [y·h/8, (y+1)·h/8)` (every source pixel
    * contributes to exactly one cell; tiny images keep ≥ 1 pixel per
    * cell via the lo+1 floor) — then one bit per adjacent horizontal
    * cell pair (`left > right`), row-major — a 64-char '0'/'1' string in
    * exactly the SimHash fingerprint representation, so the pigeonhole
    * band join + codegen Hamming verify
    * ([[graft.dedup.Dedup.simhashPairsFromSignatures]]) applies verbatim.
    *
    * Area averaging (box resize), NOT nearest sampling, is what makes
    * the hash RESCALE-ROBUST — the property real corpora need, where
    * the same image circulates at several resolutions: a k× upscale has
    * identical cell means (each cell covers the same source content), so
    * the fingerprint is bit-identical; interpolated rescales move each
    * cell mean only marginally. Nearest sampling reads one pixel per
    * cell and flips bits under any resampling. On the integer-stride
    * fixtures (18×16 → exact 2×2 boxes) the cell means remain
    * closed-form predictable, so the SQL oracle still recomputes the
    * exact fingerprint. Non-decodable payloads yield a NULL hash tagged
    * `codec='stub'` (hostile bytes never throw). Bounded mapPartitions
    * batches — the justified codec-work shape.
    *
    * `cols`/`rows` set the sample grid — (cols−1)·rows fingerprint
    * bits. The 9×8 default is the classic 64-bit dHash; 9×16 yields the
    * 128-BIT production variant, the documented knob for the band
    * join's birthday term: 4 bands of 32-bit keys shrink the
    * O(n²/2^width) random-collision floor by 2¹⁶, which a ≥1e5-signature
    * corpus (any 100 TB media crawl) needs (BASELINE.md
    * `video_fingerprint_pairs`).
    */
  def dHash(spark: SparkSession, media: DataFrame,
            cols: Int = 9, rows: Int = 8): Dataset[ImageHash] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions(_.map { m =>
      val img = readImage(m.payload)
      if (img == null) ImageHash(m.media_id, null, "stub")
      else ImageHash(m.media_id, dHashOf(img, cols, rows), "imageio")
    })
  }

  /** The (cols−1)·rows-bit dHash of one decoded image (shared by the
    * still-image path above and the per-frame hashing of
    * [[videoFingerprint]]).
    */
  private def dHashOf(img: java.awt.image.BufferedImage,
                      cols: Int, rows: Int): String = {
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    def boxMean(xCell: Int, yCell: Int): Double = {
      val x0 = xCell * w / cols
      val x1 = math.max(x0 + 1, (xCell + 1) * w / cols)
      val y0 = yCell * h / rows
      val y1 = math.max(y0 + 1, (yCell + 1) * h / rows)
      var s = 0L
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) { s += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      s.toDouble / ((x1 - x0) * (y1 - y0))
    }
    val sb = new java.lang.StringBuilder((cols - 1) * rows)
    var y = 0
    while (y < rows) {
      val row = new Array[Double](cols)
      var c = 0
      while (c < cols) { row(c) = boxMean(c, y); c += 1 }
      var x = 0
      while (x < cols - 1) {
        sb.append(if (row(x) > row(x + 1)) '1' else '0')
        x += 1
      }
      y += 1
    }
    sb.toString
  }

  final case class AudioMeta(media_id: Long, n_bytes: Int, sample_rate: Int,
                             channels: Int, bits: Int, n_frames: Long,
                             codec: String)

  /** Synthesize REAL RIFF/WAVE payloads (16-bit mono PCM, hand-built
    * 44-byte canonical header — pure JDK, no codec dependency): sample
    * rate and frame count are arithmetic in the id
    * (`rate = 8000·(1 + id % 3)`, `frames = 50 + id % 100`), so a SQL
    * oracle can predict exactly what a correct WAV parser must recover.
    * Same bounded mapPartitions batch shape as [[synthesizeImages]].
    */
  def synthesizeAudio(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spreadIds(df, idCol)
      .mapPartitions(_.map { id =>
        val rate = 8000 * (1 + (id % 3).toInt)
        val frames = 50 + (id % 100).toInt
        val dataLen = frames * 2 // 16-bit mono
        val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        buf.put("WAVE".getBytes("US-ASCII"))
        buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        buf.putShort(1) // PCM
        buf.putShort(1) // mono
        buf.putInt(rate)
        buf.putInt(rate * 2) // byte rate
        buf.putShort(2)      // block align
        buf.putShort(16)     // bits per sample
        buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
        var i = 0
        while (i < frames) {
          buf.putShort((((id * 31 + i * 7) % 65536) - 32768).toShort)
          i += 1
        }
        MediaFile(id, "audio", buf.array())
      })
      .toDF()
  }

  /** REAL audio decode: parse the payload with `javax.sound.sampled`
    * (JDK-standard WAV/AIFF/AU readers; header-only — `getAudioFileFormat`
    * never touches the PCM data) and emit the actual sample rate, channel
    * count, bit depth, and frame count. Payloads no reader recognizes
    * fall back to the deterministic stub, tagged `codec = "stub"` — the
    * same real/stub split [[decodeImageMeta]] uses for images.
    */
  def decodeAudioMeta(spark: SparkSession, media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions(_.map { m =>
      val ff =
        try audioFormatOf(m.payload)
        catch { case _: Exception => null }
      if (ff != null) {
        val f = ff.getFormat
        AudioMeta(m.media_id, m.payload.length, f.getSampleRate.toInt,
          f.getChannels, f.getSampleSizeInBits, ff.getFrameLength.toLong,
          ff.getType.getExtension)
      } else {
        val s = stubDecode(m)
        AudioMeta(m.media_id, s.n_bytes, s.width * 100, 0, 0, s.checksum, "stub")
      }
    })
  }

  /** REAL audio downsample: decode the PCM frames with
    * `javax.sound.sampled`, keep every `factor`-th frame (decimation —
    * the resample every feature-extraction pipeline runs before a
    * fixed-rate model), re-encode as a canonical WAV, and return the
    * metadata of the RE-DECODED output — the declared result is what a
    * consumer actually reads back, so the whole decode→transform→encode
    * chain is verified, not just the arithmetic. Unparseable payloads
    * fall back to the tagged stub. Narrow map, bounded per row.
    */
  def downsampleAudio(spark: SparkSession, media: DataFrame,
                      factor: Int = 2): Dataset[AudioMeta] = {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    media.as[MediaFile].mapPartitions(_.map { m =>
      try {
        val ais = audioStreamOf(m.payload)
        val fmt = ais.getFormat
        val frameSize = fmt.getFrameSize
        val bytes = ais.readAllBytes()
        val nFrames = bytes.length / frameSize
        val outFrames = (nFrames + factor - 1) / factor
        val out = new Array[Byte](outFrames * frameSize)
        var i = 0
        while (i < outFrames) {
          System.arraycopy(bytes, i * factor * frameSize, out, i * frameSize, frameSize)
          i += 1
        }
        val outFmt = new AudioFormat(fmt.getEncoding, fmt.getSampleRate / factor,
          fmt.getSampleSizeInBits, fmt.getChannels, frameSize,
          fmt.getFrameRate / factor, fmt.isBigEndian)
        val baos = new java.io.ByteArrayOutputStream()
        writeWave(
          new AudioInputStream(new java.io.ByteArrayInputStream(out), outFmt, outFrames),
          baos)
        val ff = audioFormatOf(baos.toByteArray)
        AudioMeta(m.media_id, baos.size(), ff.getFormat.getSampleRate.toInt,
          ff.getFormat.getChannels, ff.getFormat.getSampleSizeInBits,
          ff.getFrameLength.toLong, "wav")
      } catch { case _: Exception =>
        val s = stubDecode(m)
        AudioMeta(m.media_id, s.n_bytes, 0, 0, 0, 0L, "stub")
      }
    })
  }

  /** Audio near-dup fixture geometry: 72 equal 4-sample windows arranged
    * as a 9 (time-major column) × 8 grid, so the energy-envelope
    * fingerprint's window strides are exact integers (288 / 72 = 4) and
    * every windowed energy is arithmetically predictable — the audio
    * counterpart of [[NearDupW]]/[[NearDupH]].
    */
  val NearDupAudioWindows = 72
  val NearDupAudioWin = 4
  val NearDupAudioFrames: Int = NearDupAudioWindows * NearDupAudioWin

  /** The audio fixture's sample formula — single source of truth for the
    * synthesizer, the spec, and the oracle-SQL builder ([[nearDupPixel]]'s
    * contract): window w = i/4 maps to grid cell (cx = w % 9, cy = w / 9),
    * the sample value repeats [[nearDupPixel]]'s quadratic pattern over
    * the cell plus a within-window ramp. Values land in 0..255 (positive
    * 16-bit PCM), so |sample| = sample and window energies are exact
    * integer sums. Variant v = 1 perturbs only window (0,0), which feeds
    * exactly ONE fingerprint bit — paired clips are perceptually
    * identical; different groups are unrelated envelopes.
    */
  def nearDupSample(g: Long, v: Long, i: Int): Int = {
    val w = i / NearDupAudioWin
    val cx = w % 9
    val cy = w / 9
    (((g % 256) * (53 + 11 * cx + 13 * cy) +
      ((g / 256) % 256) * (19 + 7 * cx + 17 * cy) +
      ((g / 65536) % 256) * (23 + 29 * cx + 3 * cy) +
      (3 * cx * cx + 5 * cy * cy + 7 * cx * cy) +
      (i % NearDupAudioWin) +
      (if (v == 1 && cx == 0 && cy == 0) 200L else 0L)) % 256).toInt
  }

  /** Synthesize REAL RIFF/WAVE near-dup pairs (16-bit mono PCM, 8 kHz):
    * ids 2g and 2g+1 render the same [[nearDupSample]] envelope, the odd
    * variant with one perturbed window — the audio counterpart of
    * [[synthesizeNearDupImages]]. Same bounded mapPartitions batch shape.
    */
  def synthesizeNearDupAudio(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spreadIds(df, idCol)
      .mapPartitions(_.map { id =>
        val (g, v) = (id / 2, id % 2)
        val dataLen = NearDupAudioFrames * 2
        val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        buf.put("WAVE".getBytes("US-ASCII"))
        buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        buf.putShort(1) // PCM
        buf.putShort(1) // mono
        buf.putInt(8000)
        buf.putInt(8000 * 2)
        buf.putShort(2)
        buf.putShort(16)
        buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
        var i = 0
        while (i < NearDupAudioFrames) {
          buf.putShort(nearDupSample(g, v, i).toShort)
          i += 1
        }
        MediaFile(id, "audio", buf.array())
      })
      .toDF()
  }

  final case class AudioHash(media_id: Long, afp: String, codec: String)

  /** Perceptual audio fingerprint: decode the PCM with
    * `javax.sound.sampled`, AVERAGE |sample| over a 9×8 grid of
    * consecutive time windows (window (cx, cy) covers samples
    * `[w·n/72, (w+1)·n/72)` for w = cy·9 + cx — every sample contributes
    * to exactly one window; tiny clips keep ≥ 1 sample per window via
    * the lo+1 floor), then one bit per adjacent window pair in each row
    * (`left > right`) — a 64-char '0'/'1' energy-envelope contour in
    * exactly the SimHash fingerprint representation, so the pigeonhole
    * band join + codegen Hamming verify
    * ([[graft.dedup.Dedup.simhashPairsFromSignatures]]) applies verbatim,
    * mirroring [[dHash]] for images.
    *
    * Mean (not sum) comparison makes the contour RESAMPLE-ROBUST: a k×
    * decimation or upsample preserves each window's mean |amplitude|, so
    * the same recording at different rates fingerprints near-identically
    * — the property a real audio corpus needs. On the integer-stride
    * fixtures the windows are equal-width, so the mean comparison is the
    * integer-exact sum comparison the SQL oracle replays. Non-PCM-16 or
    * unparseable payloads yield a NULL hash tagged `codec='stub'`
    * (hostile bytes never throw). Bounded mapPartitions batches.
    *
    * `cols`/`rows` set the window grid — (cols−1)·rows bits; 9×16 is
    * the 128-bit production variant (see [[dHash]]'s knob note).
    */
  def audioFingerprint(spark: SparkSession, media: DataFrame,
                       cols: Int = 9, rows: Int = 8): Dataset[AudioHash] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions(_.map { m =>
      try {
        val ais = audioStreamOf(m.payload)
        val fmt = ais.getFormat
        val bytes = ais.readAllBytes()
        val ch = math.max(fmt.getChannels, 1)
        val n = bytes.length / (2 * ch) // FRAMES, not interleaved samples
        if (fmt.getSampleSizeInBits != 16 || n < 1)
          AudioHash(m.media_id, null, "stub")
        else {
          val be = fmt.isBigEndian
          def rawSample(i: Int): Int = {
            val b0 = bytes(2 * i)
            val b1 = bytes(2 * i + 1)
            if (be) (b0 << 8) | (b1 & 0xff) else (b1 << 8) | (b0 & 0xff)
          }
          // |amplitude| of frame f: mono reads the sample directly;
          // multi-channel DOWNMIXES (mean across channels) so a stereo
          // master and its mono downmix land on the same contour —
          // interleaved channels must never masquerade as time steps.
          // scaled by ch (not divided) so the mono path stays INTEGER —
          // the oracle's arithmetic — and the comparison is scale-free.
          def frameAmp(f: Int): Long =
            if (ch == 1) math.abs(rawSample(f)).toLong
            else {
              var s = 0L
              var c = 0
              while (c < ch) { s += rawSample(f * ch + c); c += 1 }
              math.abs(s)
            }
          val windows = cols * rows
          def winMean(w: Int): Double = {
            // Long window arithmetic: w * n overflows Int from ~30M
            // frames (~11 min at 44.1 kHz) — the silent-stub bug class
            val i0 = (w.toLong * n / windows).toInt
            val i1 = math.max(i0 + 1,
              ((w + 1).toLong * n / windows).toInt)
            var s = 0L
            var i = i0
            while (i < i1) { s += frameAmp(i); i += 1 }
            s.toDouble / (i1 - i0)
          }
          val sb = new java.lang.StringBuilder((cols - 1) * rows)
          var cy = 0
          while (cy < rows) {
            val row = new Array[Double](cols)
            var c = 0
            while (c < cols) { row(c) = winMean(cy * cols + c); c += 1 }
            var x = 0
            while (x < cols - 1) {
              sb.append(if (row(x) > row(x + 1)) '1' else '0')
              x += 1
            }
            cy += 1
          }
          AudioHash(m.media_id, sb.toString, "pcm16")
        }
      } catch { case _: Exception => AudioHash(m.media_id, null, "stub") }
    })
  }

  final case class VideoMeta(media_id: Long, n_bytes: Int, width: Int,
                             height: Int, duration_ms: Long, n_tracks: Int,
                             codec: String)

  /** Synthesize REAL ISO BMFF (MP4) containers — `ftyp` + `moov` with a
    * version-0 `mvhd` (timescale 1000, duration arithmetic in the id) and
    * one `trak`/`tkhd` carrying 16.16 fixed-point dimensions
    * (`width = 16·(1 + id % 40)`, `height = 9·(1 + id % 40)`,
    * `duration_ms = 500 + id % 10000`), so a SQL oracle predicts exactly
    * what a correct box parser must recover. No media data (`mdat`) — the
    * payload is a pure container header, which is all metadata extraction
    * reads at scale anyway.
    */
  /** Codec fourccs round-robined into the synthesized `stsd` when
    * `withCodec = true` — the common web-corpus sample-entry types.
    */
  val CodecFourccs: Seq[String] = Seq("avc1", "hev1", "mp4v", "vp09", "av01")

  def synthesizeVideo(df: DataFrame, idCol: String,
                      withCodec: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spreadIds(df, idCol)
      .mapPartitions(_.map { id =>
        val w = 16 * (1 + (id % 40).toInt)
        val h = 9 * (1 + (id % 40).toInt)
        val durMs = 500 + (id % 10000).toInt
        // with a codec: trak additionally carries the
        // mdia { minf { stbl { stsd { <fourcc entry> } } } } chain
        // (48 bytes) naming the sample-entry codec
        val mdiaSz = if (withCodec) 48 else 0
        val buf = java.nio.ByteBuffer.allocate(20 + 216 + mdiaSz) // big-endian (MP4)
        def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII")): Unit
        // ftyp
        buf.putInt(20); fourcc("ftyp"); fourcc("isom"); buf.putInt(0); fourcc("isom")
        // moov { mvhd, trak { tkhd [, mdia] } }
        buf.putInt(216 + mdiaSz); fourcc("moov")
        buf.putInt(108); fourcc("mvhd")
        buf.putInt(0)           // version 0 + flags
        buf.putInt(0).putInt(0) // creation, modification
        buf.putInt(1000)        // timescale: ms
        buf.putInt(durMs)       // duration in timescale units
        buf.putInt(0x00010000)  // rate 1.0
        buf.putShort(0x0100.toShort) // volume 1.0
        buf.put(new Array[Byte](10)) // reserved
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(buf.putInt)  // identity matrix
        buf.put(new Array[Byte](24)) // pre_defined
        buf.putInt(2)           // next_track_id
        buf.putInt(100 + mdiaSz); fourcc("trak")
        buf.putInt(92); fourcc("tkhd")
        buf.putInt(0x00000007)  // version 0, flags: enabled|in_movie|in_preview
        buf.putInt(0).putInt(0) // creation, modification
        buf.putInt(1)           // track_id
        buf.putInt(0)           // reserved
        buf.putInt(durMs)       // duration
        buf.put(new Array[Byte](8)) // reserved
        buf.putShort(0).putShort(0).putShort(0).putShort(0) // layer/alt/volume/reserved
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(buf.putInt)
        buf.putInt(w << 16)     // width, 16.16 fixed point
        buf.putInt(h << 16)     // height
        if (withCodec) {
          buf.putInt(48); fourcc("mdia")
          buf.putInt(40); fourcc("minf")
          buf.putInt(32); fourcc("stbl")
          buf.putInt(24); fourcc("stsd")
          buf.putInt(0)  // version + flags
          buf.putInt(1)  // entry_count
          buf.putInt(8)  // minimal sample entry: size + fourcc only
          fourcc(CodecFourccs((id % CodecFourccs.size).toInt))
        }
        MediaFile(id, "video", buf.array())
      })
      .toDF()
  }

  /** REAL MP4 container parse: a genuine ISO BMFF box walker (size/type
    * header per box, children walked recursively for `moov`/`trak`,
    * unknown boxes skipped by size) — no offsets assumed, so any
    * conformant container with a `moov` yields its movie duration, track
    * count, and first visual track's `tkhd` dimensions. Header-only by
    * construction (never touches `mdat`). Payloads that aren't ISO BMFF
    * fall back to the deterministic stub, tagged `codec = "stub"` — the
    * same real/stub split images and audio use.
    */
  def decodeVideoMeta(spark: SparkSession, media: DataFrame): Dataset[VideoMeta] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions(_.map { m =>
      val meta = parseMp4(m.payload)
      if (meta != null) meta.copy(media_id = m.media_id)
      else {
        val s = stubDecode(m)
        VideoMeta(m.media_id, s.n_bytes, s.width, s.height, s.checksum, 0, "stub")
      }
    })
  }

  private def parseMp4(payload: Array[Byte]): VideoMeta = {
    val buf = java.nio.ByteBuffer.wrap(payload)
    def u32(at: Int): Long = buf.getInt(at).toLong & 0xffffffffL
    def typ(at: Int): String =
      new String(payload, at, 4, "US-ASCII")
    // walk the boxes of [lo, hi), returning (type, contentStart, contentEnd)
    def walk(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var at = lo
        def hasNext: Boolean = at + 8 <= hi
        def next(): (String, Int, Int) = {
          val size = u32(at)
          if (size < 8 || at + size > hi) { at = hi; ("", 0, 0) }
          else {
            val r = (typ(at + 4), at + 8, at + size.toInt)
            at += size.toInt
            r
          }
        }
      }
    try {
      if (payload.length < 8 || walk(0, payload.length)
            .forall { case (t, _, _) => t != "ftyp" && t != "moov" }) return null
      val moov = walk(0, payload.length).collectFirst { case ("moov", s, e) => (s, e) }
      moov match {
        case None => null
        case Some((ms, me)) =>
          var durationMs = 0L
          var width = 0
          var height = 0
          var tracks = 0
          var codec: String = null
          // codec IDENTITY lives in the sample description box: descend
          // trak → mdia → minf → stbl → stsd and read the first sample
          // entry's fourcc (avc1/hev1/mp4v/vp09/av01/...). Identity is
          // container metadata — reporting it needs no codec DECODER,
          // so a corpus of H.264 files still classifies correctly even
          // though frame decode for inter-frame codecs stays out of
          // scope (see the object scaladoc).
          def sampleEntryFourcc(lo: Int, hi: Int): Option[String] =
            for {
              (_, ds, de) <- walk(lo, hi).find(_._1 == "mdia")
              (_, ns, ne) <- walk(ds, de).find(_._1 == "minf")
              (_, bs, be) <- walk(ns, ne).find(_._1 == "stbl")
              (_, ss, se) <- walk(bs, be).find(_._1 == "stsd")
              // stsd content: 4B version/flags + 4B entry_count (ss+4),
              // then sample entries, each a box (size at ss+8, TYPE =
              // codec fourcc at ss+12). Require a declared entry AND a
              // plausible first-entry box size — entry_count alone
              // admits a zero-size corrupt entry, the size alone admits
              // padding after an entry_count of 0.
              if se - ss >= 16 && u32(ss + 4) >= 1 && u32(ss + 8) >= 8
            } yield typ(ss + 12)
          walk(ms, me).foreach {
            case ("mvhd", s, _) =>
              // version 1 widens creation/modification to 64 bits and
              // duration to u64; timescale stays u32 in both
              val v1 = (payload(s) & 0xff) == 1
              val timescale = if (v1) u32(s + 20) else u32(s + 12)
              val duration = if (v1) buf.getLong(s + 24) else u32(s + 16)
              if (timescale > 0) durationMs = duration * 1000L / timescale
            case ("trak", s, e) =>
              tracks += 1
              walk(s, e).foreach {
                case ("tkhd", ts, te) if width == 0 && te - ts >= 84 =>
                  width = (u32(te - 8) >> 16).toInt
                  height = (u32(te - 4) >> 16).toInt
                case _ =>
              }
              if (codec == null) codec = sampleEntryFourcc(s, e).orNull
            case _ =>
          }
          VideoMeta(0L, payload.length, width, height, durationMs, tracks,
            if (codec != null) codec else "mp4")
      }
    } catch { case _: Exception => null }
  }

  final case class VideoFrame(media_id: Long, frame_idx: Int, width: Int,
                              height: Int, n_bytes: Int, codec: String)

  /** Synthesize REAL AVI/MJPEG containers (RIFF `hdrl`/`strl`/`movi`
    * structure with genuine javax.imageio-encoded JPEG frames in `00dc`
    * chunks — MJPEG is the one video codec the JDK decodes for free,
    * frame-by-frame, since every frame IS a JPEG). Frame count and
    * dimensions are arithmetic in the id (`frames = 2 + id % 4`,
    * `width = 8 + id % 8`, `height = 8 + id % 5`), so a SQL oracle
    * predicts exactly what a correct container walker + frame decoder
    * must recover. Same bounded mapPartitions shape as the other
    * synthesizers.
    */
  def synthesizeAviMjpeg(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spreadIds(df, idCol)
      .mapPartitions(_.map { id =>
        val nFrames = 2 + (id % 4).toInt
        val w = 8 + (id % 8).toInt
        val h = 8 + (id % 5).toInt
        val jpegs = (0 until nFrames).map { f =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.getRaster.setSample(x, y, 0, (id + f + x + y) % 256); x += 1 }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", baos)
          baos.toByteArray
        }
        val moviContent = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
        val hdrlContent = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
        val riffContent = 4 + (8 + hdrlContent) + (8 + moviContent)
        val buf = java.nio.ByteBuffer.allocate(8 + riffContent)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII")): Unit
        fourcc("RIFF"); buf.putInt(riffContent); fourcc("AVI ")
        fourcc("LIST"); buf.putInt(hdrlContent); fourcc("hdrl")
        fourcc("avih"); buf.putInt(56)
        buf.putInt(33333)        // usec per frame (~30fps)
        buf.putInt(0).putInt(0)  // max bytes/sec, padding
        buf.putInt(0)            // flags
        buf.putInt(nFrames)
        buf.putInt(0)            // initial frames
        buf.putInt(1)            // streams
        buf.putInt(0)            // suggested buffer
        buf.putInt(w).putInt(h)
        buf.putInt(0).putInt(0).putInt(0).putInt(0) // reserved
        fourcc("LIST"); buf.putInt(4 + 64 + 48); fourcc("strl")
        fourcc("strh"); buf.putInt(56)
        fourcc("vids"); fourcc("MJPG")
        buf.putInt(0)            // flags
        buf.putShort(0).putShort(0) // priority, language
        buf.putInt(0)            // initial frames
        buf.putInt(1).putInt(30) // scale, rate (30 fps)
        buf.putInt(0)            // start
        buf.putInt(nFrames)      // length (frames)
        buf.putInt(0)            // suggested buffer
        buf.putInt(-1)           // quality
        buf.putInt(0)            // sample size
        buf.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
        fourcc("strf"); buf.putInt(40)
        buf.putInt(40)           // biSize
        buf.putInt(w).putInt(h)
        buf.putShort(1).putShort(24) // planes, bit count
        fourcc("MJPG")           // biCompression
        buf.putInt(0)            // image size
        buf.putInt(0).putInt(0)  // x/y pels per meter
        buf.putInt(0).putInt(0)  // clr used/important
        fourcc("LIST"); buf.putInt(moviContent); fourcc("movi")
        jpegs.foreach { j =>
          fourcc("00dc"); buf.putInt(j.length); buf.put(j)
          if ((j.length & 1) == 1) buf.put(0.toByte)
        }
        MediaFile(id, "video", buf.array())
      })
      .toDF()
  }

  /** REAL codec-level video frame decode for MJPEG-in-AVI: a RIFF walker
    * finds the `movi` LIST and pulls each `..dc`/`..db` chunk, and each
    * frame decodes with the SAME javax.imageio JPEG reader the image path
    * uses (in MJPEG every frame is a standalone JPEG — no inter-frame
    * state, which also makes the format embarrassingly parallel at 100 TB:
    * frames decode wherever their bytes land). Non-AVI payloads fall back
    * to the byte-slice sampling of [[sampleFrames]], tagged
    * `codec = "stub"` — same real/stub split as every other decoder here.
    */
  def decodeVideoFrames(spark: SparkSession, media: DataFrame): Dataset[VideoFrame] = {
    import spark.implicits._
    media.as[MediaFile].flatMap { m =>
      val frames = parseAviFrames(m.payload)
      if (frames != null)
        frames.zipWithIndex.map { case (j, idx) =>
          val img = readImage(j)
          if (img != null)
            VideoFrame(m.media_id, idx, img.getWidth, img.getHeight, j.length, "mjpeg")
          else VideoFrame(m.media_id, idx, 0, 0, j.length, "stub")
        }
      else {
        val slices = m.payload.grouped(64).zipWithIndex.filter(_._2 % 4 == 0)
          .map { case (chunk, idx) => VideoFrame(m.media_id, idx, 0, 0, chunk.length, "stub") }
          .toSeq
        // row-per-input contract like every other decoder: an empty
        // payload still surfaces as one tagged stub row, never vanishes
        if (slices.nonEmpty) slices
        else Seq(VideoFrame(m.media_id, 0, 0, 0, 0, "stub"))
      }
    }
  }

  /** The `movi` chunk payloads of a RIFF/AVI container, or null when the
    * payload isn't one. Little-endian sizes, odd chunks padded — walked
    * by structure, no offsets assumed.
    */
  private def parseAviFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    if (payload.length < 12) return null
    def typ(at: Int): String = new String(payload, at, 4, "US-ASCII")
    def u32(at: Int): Long =
      java.nio.ByteBuffer.wrap(payload, at, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xffffffffL
    try {
      if (typ(0) != "RIFF" || typ(8) != "AVI ") return null
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var at = 12L
      val end = math.min(payload.length.toLong, 8L + u32(4))
      while (at + 8 <= end) {
        val id = typ(at.toInt)
        val size = u32(at.toInt + 4) // u32: corrupt sizes stay positive longs
        if (at + 8 + size > end) at = end // truncated box: stop, don't loop
        else {
          if (id == "LIST" && at + 12 <= end && typ(at.toInt + 8) == "movi") {
            var sub = at + 12
            val subEnd = at + 8 + size
            while (sub + 8 <= subEnd) {
              val sid = typ(sub.toInt)
              val ssize = u32(sub.toInt + 4)
              if (sub + 8 + ssize > subEnd) sub = subEnd
              else {
                if (sid.endsWith("dc") || sid.endsWith("db"))
                  frames += java.util.Arrays.copyOfRange(
                    payload, sub.toInt + 8, (sub + 8 + ssize).toInt)
                sub += 8 + ssize + (ssize & 1)
              }
            }
          }
          at += 8 + size + (size & 1)
        }
      }
      if (frames.isEmpty) null else frames.toSeq
    } catch { case _: Exception => null }
  }

  /** Frames per near-dup video fixture (odd, so the per-bit majority
    * vote of [[videoFingerprint]] never ties on the fixtures).
    */
  val NearDupVideoFrames = 3

  /** The near-dup VIDEO fixture's frame pixels: [[nearDupPixel]]'s
    * pattern with a per-frame brightness drift (+17·f — frames differ,
    * so per-frame hashes are not trivially identical) and the v=1
    * perturbation applied in frames 0 AND 1 (2 of 3 — enough to flip
    * the MAJORITY for the one affected bit, so the pair's temporal
    * fingerprints differ in at most one bit; a single-frame
    * perturbation would be voted away and test nothing).
    */
  def nearDupFramePixel(g: Long, v: Long, x: Int, y: Int, f: Int): Int =
    (((g % 256) * (53 + 11 * x + 13 * y) +
      ((g / 256) % 256) * (19 + 7 * x + 17 * y) +
      ((g / 65536) % 256) * (23 + 29 * x + 3 * y) +
      (3 * x * x + 5 * y * y + 7 * x * y) + 17L * f +
      (if (v == 1 && x == 0 && y == 0 && f < 2) 200L else 0L)) % 256).toInt

  /** Synthesize REAL Motion-PNG-in-AVI pairs for video perceptual
    * near-dup testing: ids 2g and 2g+1 render [[nearDupFramePixel]]
    * over [[NearDupVideoFrames]] losslessly-encoded PNG frames (fourcc
    * `MPNG` — unlike MJPEG, PNG frames decode to the EXACT synthesized
    * pixels, so the SQL oracle can predict the fingerprint
    * bit-for-bit), wrapped in the same RIFF/AVI container layout as
    * [[synthesizeAviMjpeg]].
    */
  def synthesizeNearDupVideo(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spreadIds(df, idCol)
      .mapPartitions(_.map { id =>
        val (g, v) = (id / 2, id % 2)
        val (w, h) = (NearDupW, NearDupH)
        val nFrames = NearDupVideoFrames
        val pngs = (0 until nFrames).map { f =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.getRaster.setSample(x, y, 0, nearDupFramePixel(g, v, x, y, f))
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          baos.toByteArray
        }
        MediaFile(id, "video", aviContainer(pngs, w, h, "MPNG"))
      })
      .toDF()
  }

  /** A structurally valid RIFF/AVI container around pre-encoded frame
    * payloads — the writer [[synthesizeNearDupVideo]] uses, exposed so
    * specs can assemble frame sequences (vote suppression, frame-drop
    * robustness) without duplicating the RIFF layout.
    */
  def aviContainer(frames: Seq[Array[Byte]], w: Int, h: Int,
                   codec: String): Array[Byte] = {
    val nFrames = frames.length
    val moviContent = 4 + frames.map(p => 8 + p.length + (p.length & 1)).sum
    val hdrlContent = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffContent = 4 + (8 + hdrlContent) + (8 + moviContent)
    val buf = java.nio.ByteBuffer.allocate(8 + riffContent)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII")): Unit
    fourcc("RIFF"); buf.putInt(riffContent); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlContent); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(33333)
    buf.putInt(0).putInt(0)
    buf.putInt(0)
    buf.putInt(nFrames)
    buf.putInt(0)
    buf.putInt(1)
    buf.putInt(0)
    buf.putInt(w).putInt(h)
    buf.putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); buf.putInt(4 + 64 + 48); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc(codec)
    buf.putInt(0)
    buf.putShort(0).putShort(0)
    buf.putInt(0)
    buf.putInt(1).putInt(30)
    buf.putInt(0)
    buf.putInt(nFrames)
    buf.putInt(0)
    buf.putInt(-1)
    buf.putInt(0)
    buf.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40)
    buf.putInt(w).putInt(h)
    buf.putShort(1).putShort(24)
    fourcc(codec)
    buf.putInt(0)
    buf.putInt(0).putInt(0)
    buf.putInt(0).putInt(0)
    fourcc("LIST"); buf.putInt(moviContent); fourcc("movi")
    frames.foreach { f =>
      fourcc("00dc"); buf.putInt(f.length); buf.put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte): Unit
    }
    buf.array()
  }

  final case class VideoHash(media_id: Long, vfp: String, codec: String)

  /** Temporal perceptual fingerprint for video: decode every container
    * frame through the REAL codec path ([[parseAviFrames]] +
    * javax.imageio — MJPEG and Motion-PNG both work, each frame is a
    * standalone still), per-frame dHash with the SAME cell geometry as
    * the still-image path (`cols`/`rows` — 9×8 default 64 bits, 9×16
    * the 128-bit production variant), then one MAJORITY vote per bit
    * position across the decodable frames (strict majority → '1';
    * ties → '0'). Majority voting is what makes the fingerprint robust
    * to frame drops, re-encodes of a few frames, and boundary
    * trims — the failure modes video near-dups actually exhibit — while
    * staying a 64-bit SimHash-representation string, so the pigeonhole
    * band join + codegen Hamming verify
    * ([[graft.dedup.Dedup.simhashPairsFromSignatures]]) applies
    * VERBATIM, completing the image/audio/video near-dup triple on one
    * shared band machinery. Non-AVI or undecodable payloads yield a
    * NULL fingerprint tagged `codec='stub'` (hostile bytes never
    * throw) — same real/stub split as every decoder here.
    */
  def videoFingerprint(spark: SparkSession, media: DataFrame,
                       cols: Int = 9, rows: Int = 8): Dataset[VideoHash] = {
    import spark.implicits._
    val bits = (cols - 1) * rows
    media.as[MediaFile].mapPartitions(_.map { m =>
      val frames = parseAviFrames(m.payload)
      if (frames == null) VideoHash(m.media_id, null, "stub")
      else {
        val hashes = frames.flatMap { f =>
          val img = try readImage(f) catch { case _: Exception => null }
          if (img == null) None else Some(dHashOf(img, cols, rows))
        }
        if (hashes.isEmpty) VideoHash(m.media_id, null, "stub")
        else {
          val n = hashes.length
          val sb = new java.lang.StringBuilder(bits)
          var i = 0
          while (i < bits) {
            var ones = 0
            hashes.foreach(h => if (h.charAt(i) == '1') ones += 1)
            sb.append(if (2 * ones > n) '1' else '0')
            i += 1
          }
          VideoHash(m.media_id, sb.toString, "imageio")
        }
      }
    })
  }

  final case class Features(media_id: Long, features: Array[Double])

  /** Feature extraction over binary payloads: normalized byte histogram
    * (`bins` buckets over 0..255) — a real, computable feature (unlike the
    * stubbed codec decode), in the same bounded mapPartitions batch shape
    * a model-based embedder would use. Pure narrow map, no shuffle.
    */
  def byteHistogram(spark: SparkSession, media: DataFrame,
                    bins: Int = 16): Dataset[Features] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions(_.map { m =>
      val h = new Array[Double](bins)
      m.payload.foreach { b => h(((b & 0xff) * bins) / 256) += 1.0 }
      val n = math.max(m.payload.length, 1).toDouble
      Features(m.media_id, h.map(_ / n))
    })
  }
}

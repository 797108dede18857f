package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def media = Multimodal.synthesizeMedia(
    Seq((1L, "hello world"), (2L, "a much longer payload body for frames"))
      .toDF("id", "text"), "id", "text")

  test("decodeMeta is deterministic and schema-typed") {
    val a = Multimodal.decodeMeta(spark, media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeMeta(spark, media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(m => m.n_bytes > 0 && m.width >= 16 && m.height >= 16))
    assert(a.map(_.kind).toSet.subsetOf(Set("image", "audio", "video")))
  }

  test("frame sampling emits every stride-th fixed-size chunk") {
    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 4, stride = 2)
      .collect().filter(_.media_id == 2L)
    // 38 bytes -> ceil(38/4)=10 chunks -> indices 0,2,4,6,8 kept
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.forall(_.payload.length <= 4))
  }

  test("resizePayload truncates to the byte budget") {
    val out = Multimodal.resizePayload(media, 5).collect()
    out.foreach(r => assert(r.getAs[Array[Byte]]("payload_resized").length <= 5))
  }

  test("real WAV decode recovers the synthesized header fields; non-audio falls back to stub") {
    val ids = Seq(0L, 1L, 2L, 99L, 100L, 257L).toDF("id")
    val metas = Multimodal.decodeAudioMeta(spark, Multimodal.synthesizeAudio(ids, "id"))
      .collect().map(m => m.media_id -> m).toMap
    assert(metas.keySet == Set(0L, 1L, 2L, 99L, 100L, 257L))
    metas.foreach { case (id, m) =>
      assert(m.codec == "wav", s"payload $id must be a real parseable WAV")
      assert(m.sample_rate == 8000 * (1 + (id % 3).toInt), s"id $id rate")
      assert(m.n_frames == 50 + (id % 100), s"id $id frames")
      assert(m.channels == 1 && m.bits == 16)
      assert(m.n_bytes == 44 + 2 * m.n_frames)
    }
    // a text payload is not audio: stub fallback path, tagged as such
    val stub = Multimodal.decodeAudioMeta(spark, media).collect()
    assert(stub.nonEmpty && stub.forall(_.codec == "stub"))
  }

  test("real MP4 box walk recovers the synthesized container fields; non-video falls back to stub") {
    val ids = Seq(0L, 1L, 39L, 40L, 777L).toDF("id")
    val metas = Multimodal.decodeVideoMeta(spark, Multimodal.synthesizeVideo(ids, "id"))
      .collect().map(m => m.media_id -> m).toMap
    assert(metas.keySet == Set(0L, 1L, 39L, 40L, 777L))
    metas.foreach { case (id, m) =>
      assert(m.codec == "mp4", s"payload $id must be a parseable ISO BMFF container")
      assert(m.width == 16 * (1 + (id % 40).toInt), s"id $id width")
      assert(m.height == 9 * (1 + (id % 40).toInt), s"id $id height")
      assert(m.duration_ms == 500 + id % 10000, s"id $id duration")
      assert(m.n_tracks == 1 && m.n_bytes == 236)
    }
    // a text payload is not ISO BMFF: stub fallback path, tagged as such
    val stub = Multimodal.decodeVideoMeta(spark, media).collect()
    assert(stub.nonEmpty && stub.forall(_.codec == "stub"))
  }

  test("codec identity recovered from the stsd sample entry; codec-less containers stay 'mp4'") {
    val ids = (0L to 9L).toDF("id")
    val metas = Multimodal.decodeVideoMeta(spark,
        Multimodal.synthesizeVideo(ids, "id", withCodec = true))
      .collect().map(m => m.media_id -> m).toMap
    metas.foreach { case (id, m) =>
      val want = Multimodal.CodecFourccs((id % Multimodal.CodecFourccs.size).toInt)
      assert(m.codec == want, s"id $id: got ${m.codec}, want $want")
      // the identity pass must not disturb the rest of the walk
      assert(m.width == 16 * (1 + (id % 40).toInt) && m.n_tracks == 1)
    }
    assert(metas.values.map(_.codec).toSet == Multimodal.CodecFourccs.toSet,
      "10 ids must round-robin every fourcc")
  }

  test("real PNG decode recovers the synthesized golden dimensions") {
    val ids = Seq(0L, 1L, 7L, 15L, 16L, 144L).toDF("id")
    val metas = Multimodal.decodeImageMeta(spark, Multimodal.synthesizeImages(ids, "id"))
      .collect().map(m => m.media_id -> m).toMap
    assert(metas.keySet == Set(0L, 1L, 7L, 15L, 16L, 144L))
    metas.foreach { case (id, m) =>
      assert(m.codec == "imageio", s"payload $id must be a real decodable PNG")
      assert(m.width == 1 + (id % 16).toInt, s"id $id width")
      assert(m.height == 1 + (id % 9).toInt, s"id $id height")
      assert(m.channels == 1) // grayscale
      // PNG signature really present in the payload the decoder saw
      assert(m.n_bytes > 8)
    }
  }

  test("real image resize re-encodes to the target dimensions; non-images fall back to stub") {
    val ids = Seq(3L, 20L).toDF("id")
    val resized = Multimodal.resizeImage(spark,
      Multimodal.synthesizeImages(ids, "id"), targetW = 8, targetH = 8)
    val metas = Multimodal.decodeImageMeta(spark, resized.toDF()).collect()
    assert(metas.length == 2)
    metas.foreach { m =>
      assert(m.codec == "imageio" && m.width == 8 && m.height == 8 && m.channels == 1)
    }
    // a text payload is not decodable: stub fallback path, tagged as such
    val stub = Multimodal.decodeImageMeta(spark, media).collect()
    assert(stub.forall(_.codec == "stub"))
  }

  test("real MJPEG frame decode: RIFF walker + per-frame JPEG, exact counts and dims") {
    val ids = Seq(0L, 3L, 7L, 12L).toDF("id")
    val avis = Multimodal.synthesizeAviMjpeg(ids, "id")
    val frames = Multimodal.decodeVideoFrames(spark, avis).collect()
      .groupBy(_.media_id)
    assert(frames.keySet == Set(0L, 3L, 7L, 12L))
    frames.foreach { case (id, fs) =>
      assert(fs.length == 2 + (id % 4).toInt, s"id $id frame count")
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length).toSeq)
      fs.foreach { f =>
        assert(f.codec == "mjpeg", s"id $id must decode real JPEG frames")
        assert(f.width == 8 + (id % 8).toInt, s"id $id width")
        assert(f.height == 8 + (id % 5).toInt, s"id $id height")
        assert(f.n_bytes > 100) // a real JPEG, not a slice
      }
    }
    // non-AVI payloads fall back to the byte-slice stub, tagged as such
    val stub = Multimodal.decodeVideoFrames(spark, media).collect()
    assert(stub.nonEmpty && stub.forall(f => f.codec == "stub" && f.width == 0))
  }

  test("audio downsample halves the re-decoded rate and frame count; hostile payloads tag stub") {
    import spark.implicits._
    val ids = Seq(2L, 7L).toDF("id")
    val out = Multimodal.downsampleAudio(spark,
      Multimodal.synthesizeAudio(ids, "id"), factor = 2)
      .collect().map(a => a.media_id -> a).toMap
    Seq(2L, 7L).foreach { id =>
      val a = out(id)
      assert(a.codec == "wav", s"id $id must re-decode as a real WAV")
      assert(a.sample_rate == 4000 * (1 + (id % 3).toInt), s"id $id rate")
      assert(a.n_frames == (50 + (id % 100) + 1) / 2, s"id $id frames")
      assert(a.channels == 1 && a.bits == 16)
    }
    val stub = Multimodal.downsampleAudio(spark, media).collect()
    assert(stub.forall(_.codec == "stub"))
  }

  test("decoders never throw on hostile payloads: random, truncated, bit-flipped") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    def realPayloads(): Seq[Array[Byte]] = {
      val ids = Seq(1L, 2L).toDF("id")
      (Multimodal.synthesizeImages(ids, "id").collect() ++
        Multimodal.synthesizeAudio(ids, "id").collect() ++
        Multimodal.synthesizeVideo(ids, "id").collect() ++
        Multimodal.synthesizeAviMjpeg(ids, "id").collect())
        .map(_.getAs[Array[Byte]]("payload")).toSeq
    }
    val hostile: Seq[Array[Byte]] =
      // pure noise, including empty and sub-header sizes
      (0 until 40).map(i => Array.fill(rng.nextInt(300))(rng.nextInt().toByte)) ++
        // real containers truncated mid-structure
        realPayloads().flatMap(p => Seq(
          p.take(rng.nextInt(math.max(p.length, 1))),
          p.take(4), p.take(11))) ++
        // real containers with corrupted size/type words
        realPayloads().map { p =>
          val c = p.clone()
          (0 until 8).foreach { _ =>
            if (c.nonEmpty) c(rng.nextInt(c.length)) = rng.nextInt().toByte }
          c
        }
    val media = hostile.zipWithIndex
      .map { case (p, i) => Multimodal.MediaFile(i.toLong, "noise", p) }
      .toDF()
    val n = hostile.length.toLong
    // every decoder must return a row per input (or bounded frame rows),
    // never an executor exception; unparseable inputs carry the stub tag
    assert(Multimodal.decodeImageMeta(spark, media).count() == n)
    assert(Multimodal.decodeAudioMeta(spark, media).count() == n)
    assert(Multimodal.decodeVideoMeta(spark, media).count() == n)
    Multimodal.decodeVideoFrames(spark, media).collect() // must not throw
    assert(Multimodal.byteHistogram(spark, media).count() == n)
    // dHash: one row per input, hostile payloads tag stub with a NULL hash
    val hashes = Multimodal.dHash(spark, media).collect()
    assert(hashes.length == n)
    assert(hashes.forall(h => h.codec == "stub" && h.dhash == null))
    // audio fingerprint: same contract — note a truncated/corrupted WAV
    // that still parses as PCM-16 legitimately fingerprints, so only
    // count and never-throw are pinned here (stub tagging is pinned on
    // pure noise below)
    val afps = Multimodal.audioFingerprint(spark, media).collect()
    assert(afps.length == n)
    assert(afps.forall(h => (h.afp == null) == (h.codec == "stub")))
    // video fingerprint: same contract — a corrupted AVI whose surviving
    // frames still decode legitimately fingerprints, so count/never-throw
    // plus the null-iff-stub pairing are the pinned invariants
    val vfps = Multimodal.videoFingerprint(spark, media).collect()
    assert(vfps.length == n)
    assert(vfps.forall(h => (h.vfp == null) == (h.codec == "stub")))
  }

  test("video fingerprint matches the arithmetic prediction; pairs near, groups far") {
    import spark.implicits._
    val ids = (0L until 12L).toDF("id")
    val vids = Multimodal.synthesizeNearDupVideo(ids, "id")
    val got = Multimodal.videoFingerprint(spark, vids).collect()
      .map(h => h.media_id -> h.vfp).toMap
    // the real RIFF walk + lossless PNG frame decode + per-frame dHash +
    // majority vote must reproduce the closed-form fingerprint: exact
    // 2x2 cells make each frame's mean comparison the integer-exact sum
    // comparison, and the vote is over NearDupVideoFrames frames
    def predicted(id: Long): String = {
      val (g, v) = (id / 2, id % 2)
      def cellSum(cx: Int, cy: Int, f: Int): Long = {
        val x0 = cx * Multimodal.NearDupW / 9
        val x1 = (cx + 1) * Multimodal.NearDupW / 9
        val y0 = cy * Multimodal.NearDupH / 8
        val y1 = (cy + 1) * Multimodal.NearDupH / 8
        (for { j <- y0 until y1; i <- x0 until x1 }
          yield Multimodal.nearDupFramePixel(g, v, i, j, f).toLong).sum
      }
      (for { cy <- 0 until 8; cx <- 0 until 8 } yield {
        val ones = (0 until Multimodal.NearDupVideoFrames)
          .count(f => cellSum(cx, cy, f) > cellSum(cx + 1, cy, f))
        if (2 * ones > Multimodal.NearDupVideoFrames) '1' else '0'
      }).mkString
    }
    def dist(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    (0L until 12L).foreach(id =>
      assert(got(id) == predicted(id), s"decoded vfp diverges for id $id"))
    // the v=1 perturbation flips the majority for at most bit (0,0)
    (0L until 6L).foreach(g =>
      assert(dist(got(2 * g), got(2 * g + 1)) <= 1, s"pair $g too far"))
    for (ga <- 0L until 6L; gb <- (ga + 1) until 6L)
      assert(dist(got(2 * ga), got(2 * gb)) > 3,
        s"groups $ga and $gb unexpectedly close")
  }

  // The property the majority vote exists for: a minority of outlier
  // frames (corrupt re-encodes, inserted slates) is voted away, and
  // losing the outlier doesn't move the fingerprint.
  test("video fingerprint: majority vote suppresses a minority frame; dropping it is a no-op") {
    import spark.implicits._
    def png(g: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(Multimodal.NearDupW,
        Multimodal.NearDupH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until Multimodal.NearDupH; x <- 0 until Multimodal.NearDupW)
        img.getRaster.setSample(x, y, 0, Multimodal.nearDupFramePixel(g, 0, x, y, 0))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    def avi(frames: Array[Byte]*): Array[Byte] =
      Multimodal.aviContainer(frames, Multimodal.NearDupW, Multimodal.NearDupH, "MPNG")
    val (a, b) = (png(5L), png(9L)) // two unrelated patterns
    val media = Seq(
      (0L, "video", avi(a)),          // the pattern-A reference hash
      (1L, "video", avi(a, a, b)),    // B is the outvoted minority
      (2L, "video", avi(a, a))        // the same video with B dropped
    ).toDF("media_id", "kind", "payload")
    val got = Multimodal.videoFingerprint(spark, media).collect()
      .map(h => h.media_id -> h.vfp).toMap
    assert(got(1L) == got(0L), "minority frame leaked into the vote")
    assert(got(2L) == got(0L), "dropping the outvoted frame moved the fingerprint")
  }

  test("dHash: decoded fingerprint matches the arithmetic prediction; pairs are near, groups far") {
    import spark.implicits._
    val ids = (0L until 12L).toDF("id")
    val imgs = Multimodal.synthesizeNearDupImages(ids, "id")
    val got = Multimodal.dHash(spark, imgs).collect()
      .map(h => h.media_id -> h.dhash).toMap
    // the real decode+box-mean path must reproduce the closed-form hash:
    // on the 18×16 fixture every 9×8 cell is an exact 2×2 source box, so
    // the mean comparison is the integer-exact SUM comparison (equal
    // areas cancel the ÷4)
    def predicted(id: Long): String = {
      val (g, v) = (id / 2, id % 2)
      def cellSum(cx: Int, cy: Int): Long = {
        val x0 = cx * Multimodal.NearDupW / 9
        val x1 = (cx + 1) * Multimodal.NearDupW / 9
        val y0 = cy * Multimodal.NearDupH / 8
        val y1 = (cy + 1) * Multimodal.NearDupH / 8
        (for { j <- y0 until y1; i <- x0 until x1 }
          yield Multimodal.nearDupPixel(g, v, i, j).toLong).sum
      }
      (for { y <- 0 until 8; x <- 0 until 8 } yield
        if (cellSum(x, y) > cellSum(x + 1, y)) '1' else '0').mkString
    }
    def dist(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    (0L until 12L).foreach(id =>
      assert(got(id) == predicted(id), s"decoded dhash diverges for id $id"))
    // paired variants: the v=1 perturbation touches only pixel (0,0), so
    // only cell (0,0)'s mean moves (diluted to ±¼ of the pixel delta) —
    // at most the one bit comparing cells (0,0) and (1,0) can flip
    (0L until 6L).foreach(g =>
      assert(dist(got(2 * g), got(2 * g + 1)) <= 1, s"pair $g too far"))
    // unrelated groups: far beyond the maxDist=3 pairing radius
    for (ga <- 0L until 6L; gb <- (ga + 1) until 6L)
      assert(dist(got(2 * ga), got(2 * gb)) > 3,
        s"groups $ga and $gb unexpectedly close")
  }

  test("128-bit dHash (9x16 grid): arithmetic prediction holds; band join at 4x32-bit keys pairs the twins") {
    import spark.implicits._
    val ids = (0L until 12L).toDF("id")
    val imgs = Multimodal.synthesizeNearDupImages(ids, "id")
    val got = Multimodal.dHash(spark, imgs, cols = 9, rows = 16).collect()
      .map(h => h.media_id -> h.dhash).toMap
    // 18×16 fixture on a 9×16 grid: exact 2×1 boxes, same integer-exact
    // sum-comparison argument as the 64-bit test
    def predicted(id: Long): String = {
      val (g, v) = (id / 2, id % 2)
      def cellSum(cx: Int, cy: Int): Long = {
        val x0 = cx * Multimodal.NearDupW / 9
        val x1 = (cx + 1) * Multimodal.NearDupW / 9
        (for { i <- x0 until x1 }
          yield Multimodal.nearDupPixel(g, v, i, cy).toLong).sum
      }
      (for { y <- 0 until 16; x <- 0 until 8 } yield
        if (cellSum(x, y) > cellSum(x + 1, y)) '1' else '0').mkString
    }
    def dist(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    (0L until 12L).foreach { id =>
      assert(got(id).length == 128)
      assert(got(id) == predicted(id), s"decoded 128-bit dhash diverges for id $id")
    }
    // v=1 perturbs pixel (0,0) → only cell (0,0) of row 0 moves → at
    // most the (0,0)-(1,0) comparison flips, same locality as 64-bit
    (0L until 6L).foreach(g =>
      assert(dist(got(2 * g), got(2 * g + 1)) <= 1, s"pair $g too far"))
    for (ga <- 0L until 6L; gb <- (ga + 1) until 6L)
      assert(dist(got(2 * ga), got(2 * gb)) > 3,
        s"groups $ga and $gb unexpectedly close")
    // the band join at bits=128 (32-bit keys) must still pair every twin
    val sig = (0L until 12L).map(id => (id, got(id))).toDF("media_id", "simhash")
    val pairs = graft.dedup.Dedup.simhashPairsFromSignatures(sig, "media_id",
      bands = 4, maxDist = 3, bits = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 6L).foreach(g => assert(pairs.contains((2 * g, 2 * g + 1))))
    // a width that 4 bands cannot split is rejected loudly
    val e = intercept[IllegalArgumentException] {
      graft.dedup.Dedup.simhashPairsFromSignatures(sig, "media_id",
        bands = 4, maxDist = 3, bits = 130)
    }
    assert(e.getMessage.contains("divide"))
  }

  test("audio fingerprint matches the arithmetic prediction; pairs near, groups far") {
    import spark.implicits._
    val ids = (0L until 12L).toDF("id")
    val clips = Multimodal.synthesizeNearDupAudio(ids, "id")
    val got = Multimodal.audioFingerprint(spark, clips).collect()
      .map(h => h.media_id -> h.afp).toMap
    // the real decode+window-mean path must reproduce the closed-form
    // envelope hash: equal 4-sample windows make the mean comparison the
    // integer-exact sum comparison
    def predicted(id: Long): String = {
      val (g, v) = (id / 2, id % 2)
      def winSum(cx: Int, cy: Int): Long = {
        val w = cy * 9 + cx
        (0 until Multimodal.NearDupAudioWin)
          .map(k => Multimodal.nearDupSample(g, v,
            w * Multimodal.NearDupAudioWin + k).toLong).sum
      }
      (for { cy <- 0 until 8; cx <- 0 until 8 } yield
        if (winSum(cx, cy) > winSum(cx + 1, cy)) '1' else '0').mkString
    }
    def dist(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    (0L until 12L).foreach(id =>
      assert(got(id) == predicted(id), s"decoded afp diverges for id $id"))
    // the v=1 perturbation touches only window (0,0): at most one bit
    (0L until 6L).foreach(g =>
      assert(dist(got(2 * g), got(2 * g + 1)) <= 1, s"pair $g too far"))
    for (ga <- 0L until 6L; gb <- (ga + 1) until 6L)
      assert(dist(got(2 * ga), got(2 * gb)) > 3,
        s"groups $ga and $gb unexpectedly close")
  }

  // The property the window-mean contour exists for: the same recording
  // at a different sample rate must fingerprint near-identically.
  test("audio fingerprint resample robustness: 2x decimation stays within the pairing radius") {
    import spark.implicits._
    val ids = (0L until 8L).toDF("id")
    val clips = Multimodal.synthesizeNearDupAudio(ids, "id").localCheckpoint(true)
    val orig = Multimodal.audioFingerprint(spark, clips).collect()
      .map(h => h.media_id -> h.afp).toMap
    // decimate via the real downsample chain, then re-fingerprint the
    // re-encoded WAV
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val halved = clips.collect().map { r =>
      val m = Multimodal.MediaFile(r.getLong(0), r.getString(1),
        r.getAs[Array[Byte]](2))
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      val fmt = ais.getFormat
      val bytes = ais.readAllBytes()
      val nFrames = bytes.length / 2
      val out = new Array[Byte]((nFrames / 2) * 2)
      (0 until nFrames / 2).foreach(i =>
        System.arraycopy(bytes, i * 4, out, i * 2, 2))
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(out),
        new AudioFormat(fmt.getSampleRate / 2, 16, 1, true, fmt.isBigEndian),
        nFrames / 2), AudioFileFormat.Type.WAVE, baos)
      Multimodal.MediaFile(m.media_id, "audio", baos.toByteArray)
    }.toSeq.toDF()
    val dec = Multimodal.audioFingerprint(spark, halved).collect()
      .map(h => h.media_id -> h.afp).toMap
    def dist(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    (0L until 8L).foreach { id =>
      assert(dec(id) != null, s"decimated clip $id failed to fingerprint")
      assert(dist(orig(id), dec(id)) <= 3,
        s"decimation moved id $id ${dist(orig(id), dec(id))} bits — envelope not rate-robust")
    }
    graft.util.Pins.release(clips)
  }

  test("audio fingerprint downmixes stereo: L=R stereo master equals the mono fingerprint") {
    import spark.implicits._
    val ids = (0L until 4L).toDF("id")
    val monoClips = Multimodal.synthesizeNearDupAudio(ids, "id").localCheckpoint(true)
    val mono = Multimodal.audioFingerprint(spark, monoClips).collect()
      .map(h => h.media_id -> h.afp).toMap
    // duplicate each mono sample into two channels — the stereo master
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val stereo = monoClips.collect().map { r =>
      val m = Multimodal.MediaFile(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      val fmt = ais.getFormat
      val bytes = ais.readAllBytes()
      val nFrames = bytes.length / 2
      val out = new Array[Byte](nFrames * 4)
      (0 until nFrames).foreach { i =>
        System.arraycopy(bytes, i * 2, out, i * 4, 2)
        System.arraycopy(bytes, i * 2, out, i * 4 + 2, 2)
      }
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(out),
        new AudioFormat(fmt.getSampleRate, 16, 2, true, fmt.isBigEndian),
        nFrames), AudioFileFormat.Type.WAVE, baos)
      Multimodal.MediaFile(m.media_id, "audio", baos.toByteArray)
    }.toSeq.toDF()
    val st = Multimodal.audioFingerprint(spark, stereo).collect()
      .map(h => h.media_id -> h.afp).toMap
    (0L until 4L).foreach { id =>
      assert(st(id) == mono(id),
        s"stereo master of id $id diverged from its mono fingerprint " +
          "(channels leaked into the time axis)")
    }
    graft.util.Pins.release(monoClips)
  }

  // The property the box-mean (area-average) rewrite exists for: the same
  // image circulating at several resolutions must hash near-identically.
  test("dHash rescale robustness: replication is bit-exact, interpolation stays within the pairing radius") {
    import spark.implicits._
    def dist(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    def hashes(df: org.apache.spark.sql.DataFrame) =
      Multimodal.dHash(spark, df).collect().map(h => h.media_id -> h.dhash).toMap
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, f(x, y))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }

    // 1. Integer-factor pixel replication (a box upscale) leaves every
    //    9×8 cell covering exactly the same source content, so the cell
    //    means — and the fingerprint — are BIT-IDENTICAL, even for the
    //    adversarial high-frequency near-dup pattern. (Nearest sampling,
    //    the pre-rewrite hash, flips bits under exactly this transform.)
    val noisy = (0L until 12L by 2L).map { id =>
      val g = id / 2
      Multimodal.MediaFile(id, "image",
        png(Multimodal.NearDupW, Multimodal.NearDupH,
          (x, y) => Multimodal.nearDupPixel(g, 0, x, y)))
    }
    val replicated2x = noisy.map(m => m.copy(payload = {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
      png(src.getWidth * 2, src.getHeight * 2,
        (x, y) => src.getRaster.getSample(x / 2, y / 2, 0))
    }))
    val hN = hashes(noisy.toDF()); val hNr = hashes(replicated2x.toDF())
    hN.keys.foreach(id =>
      assert(dist(hN(id), hNr(id)) == 0, s"2x replication moved bits for id $id"))

    // 2. Interpolated (bilinear, the real resizeImage path) rescales of
    //    SMOOTH content — the photo-like case, variation gentle at the
    //    cell scale — stay within the maxDist=3 pairing radius at 2x,
    //    non-integer 1.5x, and 3x (measured ≤2 bits), while unrelated
    //    smooth patterns stay ≥32 bits apart.
    def smoothPix(g: Long)(x: Int, y: Int): Int = {
      val fx = 1 + (g % 2).toInt; val fy = 1 + ((g / 2) % 2).toInt
      val v = 128 + 100 * math.sin(2 * math.Pi * (fx * x / 18.0 + fy * y / 16.0) + g * 1.1)
      math.max(0, math.min(255, v.round.toInt))
    }
    val smooth = (0L until 6L).map(g =>
      Multimodal.MediaFile(g, "image", png(18, 16, smoothPix(g))))
    val hS = hashes(smooth.toDF())
    for ((w, h) <- Seq((36, 32), (27, 24), (54, 48))) {
      val hu = hashes(Multimodal.resizeImage(spark, smooth.toDF(), w, h).toDF())
      hS.keys.foreach(id =>
        assert(dist(hS(id), hu(id)) <= 3, s"smooth ${w}x$h rescale outside pairing radius for id $id"))
    }
    for (a <- hS.keys; b <- hS.keys if a < b)
      assert(dist(hS(a), hS(b)) > 3, s"smooth groups $a/$b unexpectedly close")

    // 3. Even for the adversarial noise pattern — where interpolation
    //    genuinely changes content, the worst case for ANY perceptual
    //    hash — the retrieval margin survives: a bilinear 2x rescale
    //    stays far closer to its own original (measured ≤7 bits) than
    //    any unrelated original (measured ≥25).
    val hNb = hashes(Multimodal.resizeImage(spark, noisy.toDF(), 36, 32).toDF())
    val selfMax = hN.keys.map(id => dist(hN(id), hNb(id))).max
    val crossMin =
      (for (a <- hN.keys; b <- hN.keys if a != b) yield dist(hN(a), hNb(b))).min
    assert(selfMax <= 10, s"noisy self-distance $selfMax exceeds retrieval bound")
    assert(crossMin >= 20, s"noisy cross-distance $crossMin collapses the margin")
    assert(selfMax < crossMin)
  }
}

package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase

class MultimodalOpsSpec extends SparkTestBase {
  import MultimodalOps._

  /** Minimal valid PNG header bytes (signature + IHDR length/type +
    * width/height) — enough for header parsing, not a decodable image.
    */
  private def pngHeader(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(24)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes)
    out.putInt(w).putInt(h)
    out.array()
  }

  private def mediaDf(n: Int) = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    val rows = (0 until n).map(i =>
      Row(i.toLong, pngHeader(640 + i, 480 + i) ++ Array.fill(i * 10)(i.toByte)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("PNG/JPEG header metadata parsed without decode") {
    val df = withImageMeta(mediaDf(3), "blob")
    val m = df.orderBy("id").select("media.format", "media.width", "media.height").collect()
    assert(m(0).getString(0) == "png" && m(0).getInt(1) == 640 && m(0).getInt(2) == 480)
    assert(m(2).getInt(1) == 642 && m(2).getInt(2) == 482)
    // JPEG SOF0
    val jpeg = Array(0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x11, 0x08, 0x01, 0x00, 0x02, 0x00)
      .map(_.toByte) ++ Array.fill(8)(0.toByte)
    assert(parseImageMeta(jpeg) == Row("jpeg", 512, 256, 1, null))
    // garbage -> null fields
    assert(parseImageMeta(Array[Byte](1, 2, 3)) == Row(null, null, null, null, null))
  }

  test("JPEG walk handles fill bytes and length-less standalone markers") {
    // APP0 segment (len 4, 2 bytes payload), then 0xFF fill padding,
    // then TEM (0x01) and RST3 (0xD3) standalone markers, then SOF0
    val jpeg = Array(
      0xFF, 0xD8,                         // SOI
      0xFF, 0xE0, 0x00, 0x04, 0xAA, 0xBB, // APP0, len=4
      0xFF, 0xFF, 0xFF, 0x01,             // two fill bytes, then TEM
      0xFF, 0xD3,                         // RST3, no length
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x01, 0x00, 0x02, 0x00  // SOF0 h=256 w=512
    ).map(_.toByte) ++ Array.fill(8)(0.toByte)
    assert(parseImageMeta(jpeg) == Row("jpeg", 512, 256, 1, null))
    // EOI before any SOF -> dimensions stay null, no crash
    val eoiOnly = Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)
    assert(parseImageMeta(eoiOnly) == Row("jpeg", null, null, 1, null))
  }

  /** Real encoded fixtures via the same JDK codecs the ops use. */
  private def encodePng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def encodeWav(sampleRate: Int, amplitude: Double, nSamples: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](nSamples * 2)
    (0 until nSamples).foreach { i =>
      val s = (amplitude * 32767 * math.sin(2 * math.Pi * 440 * i / sampleRate)).toInt
      pcm(2 * i) = (s & 0xFF).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nSamples)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def blobDf(blobs: Seq[Array[Byte]]) = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    val rows = blobs.zipWithIndex.map { case (b, i) => Row(i.toLong, b) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("real image decode: features from actual PNG pixels") {
    // solid red, solid dark-green, and an undecodable garbage blob
    val df = decodeImageFeatures(blobDf(Seq(
      encodePng(64, 32, 0xFF0000), encodePng(16, 16, 0x004000),
      Array[Byte](1, 2, 3, 4))), "blob", histBins = 8)
    val rows = df.orderBy("id").select("features").collect()
    val red = rows(0).getSeq[Float](0)
    assert(red.size == 7 + 8)
    assert(red(2) == 64f / 96f)                      // aspect w/(w+h)
    assert(math.abs(red(3) - 1.0f) < 0.01)           // meanR ~ 1
    assert(red(4) < 0.01 && red(5) < 0.01)           // meanG/meanB ~ 0
    assert(red(6) < 0.01)                            // solid color: lumaStd ~ 0
    assert(math.abs(red.drop(7).sum - 1.0f) < 1e-3)  // histogram sums to 1
    val green = rows(1).getSeq[Float](0)
    assert(green(3) < 0.01 && green(4) > 0.2 && green(4) < 0.3)
    assert(rows(2).isNullAt(0))                      // garbage -> null
  }

  test("real image resize: fixed-shape grayscale bytes") {
    val df = resizeToGray(blobDf(Seq(
      encodePng(100, 60, 0xFFFFFF), encodePng(10, 10, 0x000000),
      Array[Byte](9, 9))), "blob", w = 8, h = 8)
    val rows = df.orderBy("id").select("gray").collect()
    val white = rows(0).getAs[Array[Byte]](0)
    assert(white.length == 64 && white.forall(b => (b & 0xFF) > 250))
    val black = rows(1).getAs[Array[Byte]](0)
    assert(black.length == 64 && black.forall(b => (b & 0xFF) < 5))
    assert(rows(2).isNullAt(0))
  }

  test("real audio decode: WAV sample rate, duration, rms, peak") {
    val quiet = encodeWav(8000, 0.1, 8000)   // 1s of quiet 440 Hz
    val loud = encodeWav(16000, 0.9, 4000)   // 0.25s loud
    val df = audioFeatures(blobDf(Seq(quiet, loud, Array[Byte](0, 1, 2))), "blob")
    val rows = df.orderBy("id")
      .select("audio.sample_rate", "audio.channels", "audio.n_samples",
              "audio.rms", "audio.peak").collect()
    assert(rows(0).getInt(0) == 8000 && rows(0).getInt(1) == 1)
    assert(rows(0).getLong(2) == 8000)
    // sine RMS = A/sqrt(2); peak = A
    assert(math.abs(rows(0).getFloat(3) - 0.1 / math.sqrt(2)) < 0.005)
    assert(math.abs(rows(0).getFloat(4) - 0.1) < 0.005)
    assert(rows(1).getInt(0) == 16000 && rows(1).getLong(2) == 4000)
    assert(math.abs(rows(1).getFloat(3) - 0.9 / math.sqrt(2)) < 0.02)
    assert(rows(2).isNullAt(0) || rows(2).get(0) == null)   // garbage -> null struct
  }

  test("decoded image features feed the dedup/ANN query surface") {
    // near-dup detection over decoded features: two visually identical
    // images (same color, different encode dims) vs one different
    val df = decodeImageFeatures(blobDf(Seq(
      encodePng(32, 32, 0x3060C0), encodePng(32, 32, 0x3060C0),
      encodePng(32, 32, 0xC06030))), "blob")
    import org.apache.spark.sql.functions.{aggregate => sqlAggregate, _}
    val a = df.select(col("id").as("ia"), col("features").as("fa"))
    val b = df.select(col("id").as("ib"), col("features").as("fb"))
    val pairs = a.join(b, col("ia") < col("ib"))
      .withColumn("dist", sqrt(sqlAggregate(
        zip_with(col("fa"), col("fb"), (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, v) => acc + v)))
    val close = pairs.filter(col("dist") < 0.01).select("ia", "ib").collect()
    assert(close.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
  }

  test("decode stub: deterministic features with real batch shape") {
    val df = decodeFeaturesStub(mediaDf(4), "blob", dim = 8)
    assert(df.schema("features").dataType == ArrayType(FloatType, containsNull = false))
    val f1 = df.filter(col("id") === 2).select("features").head().getSeq[Float](0)
    val f2 = decodeFeaturesStub(mediaDf(4), "blob", dim = 8)
      .filter(col("id") === 2).select("features").head().getSeq[Float](0)
    assert(f1 == f2)                // deterministic
    assert(f1.size == 8 && f1.forall(v => v >= 0f && v <= 1f))
  }

  test("real MJPEG frame sampling: split, decode, everyNth/maxFrames") {
    // a 5-frame MJPEG stream: five real JPEGs (distinct sizes so the
    // split boundaries are provably per-frame) concatenated raw
    def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames5 = (0 until 5).map(i => jpeg(8 + i, 6 + i, 0x123456 * (i + 1)))
    val stream = frames5.reduce(_ ++ _)
    assert(MultimodalOps.mjpegFrameRanges(stream).size == 5)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7L, stream)), 1),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("blob", BinaryType, nullable = false))))
    // every 2nd frame of 5 -> stream indices 0, 2, 4, decoded dims real
    val out = sampleFramesMjpeg(df, "blob", "id", everyNth = 2, maxFrames = 8)
      .orderBy("frame_idx").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    assert(out.map(r => (r.getInt(2), r.getInt(3))).toSeq ==
      Seq((8, 6), (10, 8), (12, 10)))
    // each emitted frame is byte-identical to the source JPEG
    assert(out(1).getAs[Array[Byte]]("frame_data").toSeq == frames5(2).toSeq)
    // maxFrames caps the explode
    val capped = sampleFramesMjpeg(df, "blob", "id", everyNth = 1, maxFrames = 2)
    assert(capped.count() == 2)
  }

  test("MJPEG split recovers exact frame boundaries on random sequences") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 10) {
      val frames = (0 until 1 + rnd.nextInt(6)).map { _ =>
        val img = new java.awt.image.BufferedImage(
          1 + rnd.nextInt(16), 1 + rnd.nextInt(16),
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (x <- 0 until img.getWidth; y <- 0 until img.getHeight)
          img.setRGB(x, y, rnd.nextInt())
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      val stream = frames.reduce(_ ++ _)
      val ranges = MultimodalOps.mjpegFrameRanges(stream)
      assert(ranges.size == frames.size)
      ranges.zip(frames).foreach { case ((s0, e0), f) =>
        assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(stream, s0, e0), f))
      }
    }
  }

  /** Minimal-but-valid AVI container around MJPEG frames: RIFF(AVI )
    * holding LIST hdrl(avih) + LIST movi(00dc frames, word-aligned),
    * optionally with frames wrapped in `rec ` grouping lists and an
    * interleaved audio (01wb) chunk — the shapes real muxers emit.
    */
  private def aviBytes(frames: Seq[Array[Byte]], w: Int, h: Int,
                       recWrap: Boolean = false, withAudio: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++ pad
    }
    def list(ltype: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", ltype.getBytes("US-ASCII") ++ payload)
    // avih: 14 dwords; totalFrames @16, streams @24, width @32, height @36
    val avih = Array(33333, 0, 0, 0, frames.length, 0, 1, 0, w, h, 0, 0, 0, 0)
      .flatMap(le32)
    val vid = frames.map(chunk("00dc", _))
    val movi = (if (withAudio) Seq(chunk("01wb", Array.fill(33)(7.toByte))) else Nil) ++
      (if (recWrap) vid.map(f => list("rec ", f)) else vid)
    val body = list("hdrl", chunk("avih", avih)) ++ movi.flatten
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(4 + body.length))
    bos.write("AVI ".getBytes("US-ASCII"))
    bos.write(body)
    bos.toByteArray
  }

  private def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("AVI container: RIFF walk recovers exact MJPEG frame payloads") {
    val frames = (0 until 5).map(i => jpegFrame(8 + i, 6 + i, 0x224466 * (i + 1)))
    for ((recWrap, withAudio) <- Seq((false, false), (true, false), (false, true), (true, true))) {
      val avi = aviBytes(frames, 12, 10, recWrap, withAudio)
      val ranges = MultimodalOps.aviVideoFrameRanges(avi)
      assert(ranges.size == frames.size, s"recWrap=$recWrap audio=$withAudio")
      ranges.zip(frames).foreach { case ((s0, e0), f) =>
        assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(avi, s0, e0), f))
      }
    }
  }

  test("AVI header metadata parses via parseImageMeta (format/width/height/frames)") {
    val avi = aviBytes((0 until 3).map(i => jpegFrame(9, 7, i * 1000)), 9, 7)
    assert(parseImageMeta(avi) == Row("avi", 9, 7, 3, null))
    // truncated mid-movi: the walk yields the complete frame prefix
    val frames = (0 until 4).map(i => jpegFrame(8, 8, i))
    val whole = aviBytes(frames, 8, 8)
    val lastStart = MultimodalOps.aviVideoFrameRanges(whole).last._1
    val cut = java.util.Arrays.copyOfRange(whole, 0, lastStart + 4)
    assert(MultimodalOps.aviVideoFrameRanges(cut).size >= 3)
  }

  test("AVI walk terminates on corrupt chunk sizes (no wrap-around loop)") {
    // a chunk size near 2^32 once wrapped the Int advance backwards and
    // looped the walk forever while appending ranges; the clamped Long
    // advance must terminate with the in-bounds prefix instead
    def le32(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    for (bad <- Seq(0xFFFFFFF8L, 0xFFFFFFE4L, 0x7FFFFFFFL)) {
      val blob = "RIFF".getBytes ++ le32(0x1000) ++ "AVI ".getBytes ++
        "00dc".getBytes ++ le32(bad) ++ Array.fill(16)(1.toByte)
      val ranges = MultimodalOps.aviVideoFrameRanges(blob)   // must return
      assert(ranges.size <= 1)
      ranges.foreach { case (s0, e0) =>
        assert(s0 >= 0 && e0 <= blob.length && s0 < e0)
      }
      assert(parseImageMeta(blob).getString(0) == "avi")     // must return too
    }
  }

  test("AVI MJPEG end-to-end: sampleFramesMjpeg decodes .avi blobs") {
    val frames = (0 until 5).map(i => jpegFrame(8 + i, 6 + i, 0x123456 * (i + 1)))
    val avi = aviBytes(frames, 12, 10)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9L, avi)), 1),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("blob", BinaryType, nullable = false))))
    val out = sampleFramesMjpeg(df, "blob", "id", everyNth = 2, maxFrames = 8)
      .orderBy("frame_idx").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    assert(out.map(r => (r.getInt(2), r.getInt(3))).toSeq ==
      Seq((8, 6), (10, 8), (12, 10)))
    assert(out(1).getAs[Array[Byte]]("frame_data").toSeq == frames(2).toSeq)
  }

  test("frame sampling stub: explode cardinality and keying") {
    val frames = sampleFramesStub(mediaDf(3), "blob", "id", everyNth = 10, maxFrames = 4)
    assert(frames.schema.fieldNames.toSeq == Seq("id", "frame_idx", "frame_data"))
    val perId = frames.groupBy("id").count().orderBy("id").collect().map(_.getLong(1))
    assert(perId.forall(_ >= 1))
    // frame 0 of id 0 is the first 10 bytes of its blob
    val f0 = frames.filter(col("id") === 0 && col("frame_idx") === 0)
      .head().getAs[Array[Byte]]("frame_data")
    assert(f0.length == 10)
  }

  test("blob externalization splits big blobs into side table") {
    val (slim, side) = externalizeBlobs(mediaDf(10), "blob", "id", threshold = 50)
    assert(slim.count() == 10)
    val extIds = slim.filter(col("blob_externalized")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(side.count() == extIds.size && extIds.nonEmpty)
    // externalized rows have null inline blob; others keep it
    assert(slim.filter(col("blob_externalized") && col("blob").isNotNull).count() == 0)
    assert(slim.filter(!col("blob_externalized") && col("blob").isNull).count() == 0)
    // side table join reconstructs the original bytes
    val rejoined = slim.filter(col("blob_externalized"))
      .drop("blob").join(side, "id")
    assert(rejoined.count() == extIds.size)
  }

  test("blob-budget repartitioning sizes partitions by bytes") {
    val df = mediaDf(20)
    val parts = repartitionByBlobBudget(df, "blob", targetBytes = 500)
    assert(parts.rdd.getNumPartitions >= 2)   // ~2KB of blobs / 500B target
    assert(parts.count() == 20)
  }

  // ---- MP4 (ISO BMFF) fixture: real box layout built byte-by-byte ----

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def mbox(name: String, payload: Array[Byte]*): Array[Byte] = {
    val p = payload.flatten.toArray
    be32(p.length + 8) ++ name.getBytes("US-ASCII") ++ p
  }

  /** version(0) + flags(0) prefix — the ISO "full box" header. */
  private def fullBox(name: String, payload: Array[Byte]): Array[Byte] =
    mbox(name, Array[Byte](0, 0, 0, 0), payload)

  private def mp4Trak(handler: String, stbl: Option[Array[Byte]]): Array[Byte] = {
    // hdlr payload: pre_defined(4) + handler_type(4) + reserved(12)
    val hdlr = fullBox("hdlr",
      be32(0) ++ handler.getBytes("US-ASCII") ++ Array.fill(12)(0.toByte))
    mbox("trak", (Seq(mbox("mdia", (Seq(hdlr) ++
      stbl.map(s => mbox("minf", s))): _*))): _*)
  }

  /** A structurally real MP4: ftyp, mdat (sample bytes), moov with an
    * AUDIO trak first (track selection must skip it) and the video
    * trak's full stbl. mdat data starts at byte 20 (ftyp=12 + header=8).
    */
  private def mp4Bytes(sizes: Seq[Int], stsc: Seq[(Int, Int)],
                       chunkOffsets: Seq[Int], stss: Option[Seq[Int]]): Array[Byte] = {
    val ftyp = mbox("ftyp", "isom".getBytes("US-ASCII"))
    val mdat = mbox("mdat", Array.tabulate(sizes.sum)(i => (i % 251).toByte))
    val stbl = mbox("stbl", (Seq(
      fullBox("stsz", be32(0) ++ be32(sizes.length) ++ sizes.toArray.flatMap(be32)),
      fullBox("stsc", be32(stsc.length) ++ stsc.toArray.flatMap { case (f, s) =>
        be32(f) ++ be32(s) ++ be32(1) }),
      fullBox("stco", be32(chunkOffsets.length) ++ chunkOffsets.toArray.flatMap(be32))) ++
      stss.map(s => fullBox("stss", be32(s.length) ++ s.toArray.flatMap(be32)))): _*)
    val moov = mbox("moov", mp4Trak("soun", None), mp4Trak("vide", Some(stbl)))
    ftyp ++ mdat ++ moov
  }

  test("MP4 stbl walk: keyframe byte ranges across non-uniform chunk runs") {
    // 6 samples (5,6,7,8,9,10 bytes); stsc runs: chunk1 holds 3
    // samples, chunks 2+ hold 1 → chunks at 20, 38, 46, 55; sync
    // samples 1, 4, 6.
    val sizes = Seq(5, 6, 7, 8, 9, 10)
    val blob = mp4Bytes(sizes, stsc = Seq((1, 3), (2, 1)),
      chunkOffsets = Seq(20, 38, 46, 55), stss = Some(Seq(1, 4, 6)))
    assert(isMp4(blob) && !isAvi(blob) && !isMkv(blob))
    val kf = mp4KeyframeRanges(blob)
    assert(kf == Seq((20L, 25L), (38L, 46L), (55L, 65L)), s"got $kf")
    // the ranges address real mdat bytes: mdat payload starts at 20
    // with (i % 251) filler, so byte_start 38 holds value 18
    assert((blob(38) & 0xFF) == 18)
  }

  test("MP4 without stss: every sample is a keyframe (spec default)") {
    val blob = mp4Bytes(Seq(4, 4), stsc = Seq((1, 2)),
      chunkOffsets = Seq(20), stss = None)
    assert(mp4KeyframeRanges(blob) == Seq((20L, 24L), (24L, 28L)))
  }

  test("MP4 walk terminates on corrupt box sizes and truncated tables") {
    val good = mp4Bytes(Seq(5, 5), Seq((1, 2)), Seq(20), Some(Seq(1)))
    // corrupt: size field smaller than its own header inside moov
    val corrupt = good.clone()
    val moovAt = good.indexOfSlice("moov".getBytes("US-ASCII")) - 4 // size precedes fourcc
    corrupt(moovAt) = 0; corrupt(moovAt + 1) = 0; corrupt(moovAt + 2) = 0; corrupt(moovAt + 3) = 3
    mp4KeyframeRanges(corrupt) // must not loop/throw
    // truncated: cut mid-moov — the walk yields what it can, no throw
    mp4KeyframeRanges(good.take(good.length - 10))
  }

  test("MP4 table expansion matches an independent reference on random layouts") {
    // the stbl math (stsc run expansion × stsz sizes × stco bases) is
    // the part a fixture can't exhaust — randomize layouts and check
    // against a straight-line reference computation
    val rnd = new scala.util.Random(4812)
    for (_ <- 0 until 50) {
      val nSamples = 1 + rnd.nextInt(20)
      val sizes = Seq.fill(nSamples)(1 + rnd.nextInt(9))
      // random chunking: split samples into 1..nSamples chunks
      val cuts = (Seq(0, nSamples) ++ Seq.fill(rnd.nextInt(4))(rnd.nextInt(nSamples + 1)))
        .distinct.sorted
      val perChunk = cuts.sliding(2).map { case Seq(a, b) => b - a }.toSeq.filter(_ > 0)
      // reference: per-sample offsets from first principles
      val mdatStart = 20
      val chunkStarts = perChunk.scanLeft(0)(_ + _).dropRight(1)
        .map(firstSample => mdatStart + sizes.take(firstSample).sum)
      val refOffsets = {
        var out = Vector.empty[Int]
        var s = 0
        perChunk.zip(chunkStarts).foreach { case (k, base) =>
          var off = base
          (0 until k).foreach { _ => out :+= off; off += sizes(s); s += 1 }
        }
        out
      }
      // stsc in RUN form (coalesce equal consecutive samples-per-chunk)
      val stsc = perChunk.zipWithIndex.foldLeft(Vector.empty[(Int, Int)]) {
        case (acc, (k, i)) =>
          if (acc.nonEmpty && acc.last._2 == k) acc else acc :+ ((i + 1, k))
      }
      val sync = (1 to nSamples).filter(_ => rnd.nextBoolean())
      val blob = mp4Bytes(sizes, stsc, chunkStarts, Some(sync))
      val expected = sync.map(s => (refOffsets(s - 1).toLong,
        (refOffsets(s - 1) + sizes(s - 1)).toLong))
      val got = mp4KeyframeRanges(blob)
      assert(got == expected,
        s"sizes=$sizes perChunk=$perChunk stsc=$stsc sync=$sync: $got != $expected")
    }
  }

  // ---- MKV (EBML) fixture: real element tree built byte-by-byte ----

  private def vintSize(n: Int): Array[Byte] =
    if (n <= 126) Array((0x80 | n).toByte)
    else Array((0x40 | (n >> 8)).toByte, (n & 0xFF).toByte)

  private def ebmlEl(id: Array[Byte], payload: Array[Byte]*): Array[Byte] = {
    val p = payload.flatten.toArray
    id ++ vintSize(p.length) ++ p
  }

  private def eid(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  private def euint(v: Long): Array[Byte] = {
    var out = List((v & 0xFF).toByte)
    var rest = v >>> 8
    while (rest != 0) { out = (rest & 0xFF).toByte :: out; rest >>>= 8 }
    out.toArray
  }

  test("MKV Cues walk: cue points resolve to absolute Cluster offsets") {
    val EBML = eid(0x1A, 0x45, 0xDF, 0xA3); val Segment = eid(0x18, 0x53, 0x80, 0x67)
    val Cues = eid(0x1C, 0x53, 0xBB, 0x6B); val Cluster = eid(0x1F, 0x43, 0xB6, 0x75)
    val CuePoint = eid(0xBB); val CueTime = eid(0xB3); val CueTrackPositions = eid(0xB7)
    val CueTrack = eid(0xF7); val CueClusterPosition = eid(0xF1)
    val header = ebmlEl(EBML, euint(1))
    val void = ebmlEl(eid(0xEC), Array.fill(10)(0.toByte))
    val cluster1 = ebmlEl(Cluster, Array.fill(6)(1.toByte))
    val cluster2 = ebmlEl(Cluster, Array.fill(9)(2.toByte))
    def cues(pos1: Int, pos2: Int): Array[Byte] = {
      def point(t: Int, pos: Int) = ebmlEl(CuePoint,
        ebmlEl(CueTime, euint(t)),
        ebmlEl(CueTrackPositions, ebmlEl(CueTrack, euint(1)),
          ebmlEl(CueClusterPosition, euint(pos))))
      ebmlEl(Cues, point(0, pos1), point(40, pos2))
    }
    // cue positions are relative to the Segment data start and depend
    // on the Cues element's own length — build twice; both positions
    // stay below 255 so the element length is identical
    val guess = cues(1, 1)
    val rel1 = void.length + guess.length
    val rel2 = rel1 + cluster1.length
    val segPayload = void ++ cues(rel1, rel2) ++ cluster1 ++ cluster2
    val blob = header ++ ebmlEl(Segment, segPayload)
    assert(isMkv(blob) && !isMp4(blob) && !isAvi(blob))
    val segStart = header.length + Segment.length + vintSize(segPayload.length).length
    val cps = mkvCuePoints(blob)
    assert(cps == Seq((0L, (segStart + rel1).toLong), (40L, (segStart + rel2).toLong)), s"got $cps")
    // the offsets are REAL: each points at a Cluster element id
    cps.foreach { case (_, off) =>
      assert(Cluster.indices.forall(i => blob(off.toInt + i) == Cluster(i)),
        s"offset $off does not address a Cluster element")
    }
    // truncation tolerance: cutting inside the Cues yields no throw
    mkvCuePoints(blob.take(segStart + rel1 - 3))
  }

  test("indexKeyframes dispatches AVI / MP4 / MKV blobs in one frame") {
    val avi = aviBytes(Seq(jpegFrame(8, 8, 0xFF0000), jpegFrame(8, 8, 0x00FF00)), 8, 8)
    val mp4 = mp4Bytes(Seq(5, 6), Seq((1, 2)), Seq(20), Some(Seq(2)))
    val EBML = eid(0x1A, 0x45, 0xDF, 0xA3); val Segment = eid(0x18, 0x53, 0x80, 0x67)
    val mkv = ebmlEl(EBML, euint(1)) ++ ebmlEl(Segment,
      ebmlEl(eid(0x1C, 0x53, 0xBB, 0x6B), ebmlEl(eid(0xBB),
        ebmlEl(eid(0xB3), euint(7)),
        ebmlEl(eid(0xB7), ebmlEl(eid(0xF7), euint(1)), ebmlEl(eid(0xF1), euint(2))))))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, avi), Row(2L, mp4), Row(3L, mkv),
        Row(4L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)))), schema)
    val idx = indexKeyframes(df, "blob", "id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq.sorted
    assert(idx == Seq((1L, "avi", 0), (1L, "avi", 1), (2L, "mp4", 0), (3L, "mkv", 0)),
      s"got $idx") // unknown container (id 4) yields zero rows, not fakes
    // MKV end is null (cue addresses a cluster, extent unrecorded)
    val mkvRow = indexKeyframes(df.filter(col("id") === 3L), "blob", "id").head()
    assert(mkvRow.isNullAt(4))
  }

  test("sliceKeyframes extracts the exact coded payload bytes, bounded") {
    // MP4: sync samples 1 and 3 of sizes 5,6,7 in one chunk at 20
    val sizes = Seq(5, 6, 7)
    val mp4 = mp4Bytes(sizes, Seq((1, 3)), Seq(20), Some(Seq(1, 3)))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, mp4))), schema)
    val got = sliceKeyframes(df, "blob", "id").orderBy("keyframe_idx").collect()
    assert(got.length == 2)
    // sample 1 @20 len 5; sample 3 @31 len 7 — bytes are the (i % 251)
    // mdat filler, so the slices are exactly predictable
    assert(got(0).getAs[Array[Byte]]("frame_data").toSeq ==
      (0 until 5).map(i => (i % 251).toByte))
    assert(got(1).getAs[Array[Byte]]("frame_data").toSeq ==
      (11 until 18).map(i => (i % 251).toByte))
    // maxFrames bounds the explode
    assert(sliceKeyframes(df, "blob", "id", maxFrames = 1).count() == 1)
    // MKV: each slice runs to the next cue target; last to blob end
    val EBML = eid(0x1A, 0x45, 0xDF, 0xA3); val Segment = eid(0x18, 0x53, 0x80, 0x67)
    val Cues = eid(0x1C, 0x53, 0xBB, 0x6B); val Cluster = eid(0x1F, 0x43, 0xB6, 0x75)
    val header = ebmlEl(EBML, euint(1))
    val c1 = ebmlEl(Cluster, Array.fill(5)(3.toByte))
    val c2 = ebmlEl(Cluster, Array.fill(4)(4.toByte))
    def cues(p1: Int, p2: Int) = ebmlEl(Cues,
      ebmlEl(eid(0xBB), ebmlEl(eid(0xB3), euint(0)),
        ebmlEl(eid(0xB7), ebmlEl(eid(0xF7), euint(1)), ebmlEl(eid(0xF1), euint(p1)))),
      ebmlEl(eid(0xBB), ebmlEl(eid(0xB3), euint(40)),
        ebmlEl(eid(0xB7), ebmlEl(eid(0xF7), euint(1)), ebmlEl(eid(0xF1), euint(p2)))))
    val rel1 = cues(1, 1).length
    val rel2 = rel1 + c1.length
    val seg = cues(rel1, rel2) ++ c1 ++ c2
    val mkv = header ++ ebmlEl(Segment, seg)
    val mdf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(2L, mkv))), schema)
    val mkvGot = sliceKeyframes(mdf, "blob", "id").orderBy("keyframe_idx").collect()
    assert(mkvGot.length == 2)
    assert(mkvGot(0).getAs[Array[Byte]]("frame_data").toSeq == c1.toSeq)
    assert(mkvGot(1).getAs[Array[Byte]]("frame_data").toSeq == c2.toSeq)
  }

  test("sliceKeyframes tolerates MKV cues pointing past a truncated blob") {
    // cues-at-front muxing + truncated upload: the cue legally targets
    // bytes that are not present; slice what exists instead of handing
    // copyOfRange a from > to
    val EBML = eid(0x1A, 0x45, 0xDF, 0xA3); val Segment = eid(0x18, 0x53, 0x80, 0x67)
    val mkv = ebmlEl(EBML, euint(1)) ++ ebmlEl(Segment,
      ebmlEl(eid(0x1C, 0x53, 0xBB, 0x6B), ebmlEl(eid(0xBB),
        ebmlEl(eid(0xB3), euint(7)),
        ebmlEl(eid(0xB7), ebmlEl(eid(0xF7), euint(1)), ebmlEl(eid(0xF1), euint(5000))))))
    assert(isMkv(mkv))
    // the out-of-range cue is dropped at the source, so BOTH consumers
    // (index listing and slicer) see the same truncation tolerance
    assert(mkvCuePoints(mkv).isEmpty, "past-the-end cue must be dropped")
    assert(indexKeyframes(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(Row(9L, mkv))),
        StructType(Seq(StructField("id", LongType, nullable = false),
          StructField("blob", BinaryType, nullable = false)))),
      "blob", "id").collect().isEmpty)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, mkv))), schema)
    assert(sliceKeyframes(df, "blob", "id").collect().isEmpty)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Media

class MediaSpec extends SparkSpec {

  test("media table carries binary payload + typed metadata") {
    val m = Media.mediaTable(spark, sfDir)
    val r = m.select(col("doc_id"), col("meta.byte_len"), length(col("payload")))
      .collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getInt(1) === row.getInt(2),
      "metadata byte_len must equal payload length"))
  }

  test("byteHistogram bins sum to payload length (per-partition decode)") {
    val m = Media.mediaTable(spark, sfDir).limit(20)
    val h = Media.byteHistogram(spark, m)
    val lens = m.select("doc_id", "meta.byte_len").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    h.collect().foreach { r =>
      val total = r.getAs[Seq[Long]](1).sum
      assert(total === lens(r.getLong(0)))
    }
  }

  test("frameSample keeps every stride-th fixed-size chunk") {
    val m = Media.mediaTable(spark, sfDir).limit(5)
    val frames = Media.frameSample(spark, m, chunk = 100, stride = 2)
    val byDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lens = m.select("doc_id", "meta.byte_len").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.foreach { case (id, n) =>
      val chunks = math.max((lens(id) + 99) / 100, 1)
      assert(n === (chunks + 1) / 2, s"doc $id: $chunks chunks -> keep ceil(half)")
    }
  }

  /** A real animated GIF rendered in-memory: solid full-size frames in
    * the given colors (palette-exact in GIF). */
  private def gifBytes(w: Int, h: Int, colors: Seq[Int]): Array[Byte] = {
    import javax.imageio._
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
      writer.writeToSequence(new IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("decodeFrames reads every frame of a real 3-frame GIF; frameSample strides real frames") {
    import spark.implicits._
    val bytes = gifBytes(8, 6, Seq(0xff0000, 0x00ff00, 0x0000ff))
    val frames = Media.decodeFrames(bytes)
    assert(frames.length === 3, "all three frames decode")
    assert(frames.map(_.frameNo) === Seq(0, 1, 2))
    frames.foreach(f => assert(f.width === 8 && f.height === 6 &&
      f.rgb.length === 8 * 6 * 3))
    // frame colors are palette-exact: R, then G, then B
    assert((frames(0).rgb(0) & 0xff) === 255 && (frames(0).rgb(1) & 0xff) === 0)
    assert((frames(1).rgb(1) & 0xff) === 255 && (frames(1).rgb(0) & 0xff) === 0)
    assert((frames(2).rgb(2) & 0xff) === 255 && (frames(2).rgb(0) & 0xff) === 0)
    // a single-frame PNG is one real frame; junk bytes are none
    assert(Media.decodeFrames(pngBytes(4, 4)).length === 1)
    assert(Media.decodeFrames("not a container".getBytes).isEmpty)
    // frameSample: stride 2 over the animation keeps frames 0 and 2 —
    // REAL rasters, not byte chunks
    val media = Seq((7L, bytes)).toDF("doc_id", "payload")
    val sampled = Media.frameSample(spark, media, stride = 2).collect()
      .sortBy(_.getInt(1))
    assert(sampled.map(_.getInt(1)).toSeq === Seq(0, 2))
    sampled.foreach(r =>
      assert(r.getAs[Array[Byte]](2).length === 8 * 6 * 3))
    assert((sampled(0).getAs[Array[Byte]](2)(0) & 0xff) === 255, "frame 0 is red")
    assert((sampled(1).getAs[Array[Byte]](2)(2) & 0xff) === 255, "frame 2 is blue")
  }

  test("decodeStub is deterministic and length-preserving") {
    val in = Array[Byte](1, 2, 3, -5)
    assert(Media.decodeStub(in).toSeq === Media.decodeStub(in).toSeq)
    assert(Media.decodeStub(in).length === 4)
  }

  test("resize decimates payloads by the factor") {
    val m = Media.mediaTable(spark, sfDir).limit(10)
    val r = Media.resize(spark, m, factor = 4)
    val lens = m.select("doc_id", "meta.byte_len").collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    r.select(col("doc_id"), length(col("resized"))).collect().foreach { row =>
      assert(row.getInt(1) === (lens(row.getLong(0)) + 3) / 4)
    }
  }

  /** A real PNG rendered in-memory: 4-wide gradient stripes. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / math.max(w - 1, 1)) << 16) | ((y * 255 / math.max(h - 1, 1)) << 8) | 0x40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage reads a real PNG: exact dimensions and pixels") {
    val bytes = pngBytes(16, 9)
    val im = Media.decodeImage(bytes).get
    assert(im.width === 16 && im.height === 9)
    assert(im.rgb.length === 16 * 9 * 3)
    // corner pixels follow the gradient exactly
    assert((im.rgb(0) & 0xff) === 0)                       // top-left R
    assert((im.rgb(2) & 0xff) === 0x40)                    // top-left B
    assert((im.rgb((16 * 9 - 1) * 3) & 0xff) === 255)      // bottom-right R
    // non-image bytes fall back to the stub path, never crash
    assert(Media.decodeImage("not an image".getBytes).isEmpty)
    assert(Media.decode("not an image".getBytes).length === 12)
  }

  test("imageFeatures and imageResize run the real decode distributed") {
    import spark.implicits._
    val media = Seq(
      (1L, pngBytes(16, 16)),
      (2L, pngBytes(32, 8)),
      (3L, "definitely not an image".getBytes)).toDF("doc_id", "payload")
    val feats = Media.imageFeatures(spark, media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats(1L).getInt(1) === 16 && feats(1L).getInt(2) === 16)
    assert(feats(2L).getInt(1) === 32 && feats(2L).getInt(2) === 8)
    assert(feats(3L).isNullAt(1), "undecodable payload yields null dims")
    // blue channel is constant 0x40 in the gradient
    assert(math.abs(feats(1L).getDouble(5) - 0x40) < 1e-9)
    val rs = Media.imageResize(spark, media, tw = 8, th = 8).collect()
    assert(rs.length === 2, "only decodable images resize")
    rs.foreach { r =>
      assert(r.getAs[Array[Byte]](3).length === 8 * 8 * 3)
      // every sampled pixel keeps the constant blue channel
      val px = r.getAs[Array[Byte]](3)
      (2 until px.length by 3).foreach(i => assert((px(i) & 0xff) === 0x40))
    }
  }

  /** A real WAV container rendered in-memory: 16-bit mono PCM sine. */
  private def wavBytes(hz: Double, rate: Float, nFrames: Int,
    amp: Double = 0.5): Array[Byte] = {
    import javax.sound.sampled._
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = (math.sin(2 * math.Pi * hz * i / rate) * amp * 32767).toInt
      pcm(i * 2) = s.toByte          // little-endian
      pcm(i * 2 + 1) = (s >> 8).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudio reads a real WAV: exact format, frames, and PCM") {
    val bytes = wavBytes(440.0, 8000f, 1600)
    val a = Media.decodeAudio(bytes).get
    assert(a.sampleRate === 8000f && a.channels === 1 && a.bits === 16)
    assert(a.frames === 1600 && a.pcm.length === 3200)
    // non-audio bytes are rejected, never crash
    assert(Media.decodeAudio("not audio".getBytes).isEmpty)
    // decode() routes audio through the real PCM path (not the stub)
    assert(Media.decode(bytes).toSeq === a.pcm.toSeq)
  }

  test("audioFeatures extracts signal stats distributed; non-audio yields nulls") {
    import spark.implicits._
    val media = Seq(
      (1L, wavBytes(440.0, 8000f, 8000, amp = 0.5)),
      (2L, wavBytes(100.0, 16000f, 1600, amp = 0.25)),
      (3L, "definitely not audio".getBytes)).toDF("doc_id", "payload")
    val f = Media.audioFeatures(spark, media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(f(1L).getDouble(1) === 8000.0 && f(1L).getInt(2) === 1 &&
      f(1L).getInt(3) === 16 && f(1L).getLong(4) === 8000)
    assert(math.abs(f(1L).getDouble(5) - 1000.0) < 1e-9, "1s at 8 kHz")
    // a 0.5-amplitude sine has RMS ~0.5/sqrt(2) and peak ~0.5
    assert(math.abs(f(1L).getDouble(6) - 0.5 / math.sqrt(2)) < 0.01)
    assert(math.abs(f(1L).getDouble(7) - 0.5) < 0.01)
    assert(math.abs(f(2L).getDouble(6) - 0.25 / math.sqrt(2)) < 0.01)
    assert(f(3L).isNullAt(1), "undecodable payload yields nulls")
  }

  test("extracted embeddings are unit-norm and feed the ANN operators") {
    val m = Media.mediaTable(spark, sfDir).limit(50)
    val emb = Media.extractEmbedding(spark, m)
    // unit norm (within float tolerance)
    emb.collect().foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]](1)
      assert(v.length === 16)
      val n2 = v.map(x => x.toDouble * x).sum
      assert(math.abs(n2 - 1.0) < 1e-3, s"norm^2=$n2")
    }
    // composes with the similarity machinery end-to-end: quantize and
    // score media-derived embeddings exactly like corpus embeddings
    graft.functions.GraftFunctions.register(spark)
    val q = emb
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000, 0) as bigint))").as("q"))
      .withColumn("n2", expr("array_dot_long(q, q)"))
    val probes = q.limit(2).select(col("vec_id").as("probe_id"),
      col("q").as("qa"), col("n2").as("n2a"))
    val top = broadcast(probes).crossJoin(
      q.select(col("vec_id").as("nbr_id"), col("q").as("qb"), col("n2").as("n2b")))
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .count()
    assert(top > 0)
  }

  test("audio fingerprint: re-containered PCM matches; opposite envelopes diverge") {
    import spark.implicits._
    import javax.sound.sampled._
    // amplitude-modulated sines: a rising envelope (energy grows per
    // window -> bits ~all ones) and a falling one (the opposite)
    def envWav(rising: Boolean, container: AudioFileFormat.Type): Array[Byte] = {
      val n = 6500
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val t = if (rising) i.toDouble / n else 1.0 - i.toDouble / n
        val s = (math.sin(2 * math.Pi * 440.0 * i / 8000.0) * t * 20000).toInt
        pcm(i * 2) = s.toByte
        pcm(i * 2 + 1) = (s >> 8).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, container, bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, envWav(rising = true, AudioFileFormat.Type.WAVE)),
      (2L, envWav(rising = true, AudioFileFormat.Type.AIFF)),
      (3L, envWav(rising = false, AudioFileFormat.Type.WAVE)),
      (4L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val fps = Media.audioFingerprint(spark, media).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(fps(1L).isDefined)
    // same PCM, different container (WAV little-endian vs AIFF
    // big-endian): identical fingerprint after sample normalization
    assert(fps(1L) === fps(2L), "re-containering must not change the fingerprint")
    assert(fps(4L).isEmpty)
    val hamming = java.lang.Long.bitCount(fps(1L).get ^ fps(3L).get)
    assert(hamming >= 48, s"opposite envelopes must diverge, hamming=$hamming")
    assert(java.lang.Long.bitCount(fps(1L).get) >= 56,
      "a rising envelope's windows are monotonically louder")
  }

  test("perceptual hash: re-encoded and slightly-edited images pair, distinct scenes don't") {
    import spark.implicits._
    // the same gradient scene three ways: original PNG, BMP re-encode
    // (identical pixels, different container), and a one-corner edit;
    // plus a visually different scene (inverted gradient)
    val base = pngBytes(32, 32)
    val im = Media.decodeImage(base).get
    def encode(rgb: Array[Byte], w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val i = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(i) & 0xff) << 16) |
          ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val bmp = encode(im.rgb, 32, 32, "bmp")
    val edited = { val r = im.rgb.clone(); r(0) = 255.toByte; encode(r, 32, 32, "png") }
    val inverted = { // reversed gradient: different bright/dark layout
      val r = new Array[Byte](32 * 32 * 3)
      for (i <- 0 until r.length) r(i) = (255 - (im.rgb(i) & 0xff)).toByte
      encode(r, 32, 32, "png")
    }
    val media = Seq(
      (1L, base), (2L, bmp), (3L, edited), (4L, inverted),
      (5L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val hashes = Media.perceptualHash(spark, media).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(hashes(1L).isDefined && hashes(1L) === hashes(2L),
      "container re-encode must hash identically")
    assert(hashes(5L).isEmpty, "undecodable payloads must yield null")
    val pairs = Media.imageNearDupPairs(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "re-encode pairs with the original")
    assert(pairs.contains((1L, 3L)), "a one-pixel edit stays within the hamming bound")
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L },
      "a visually different scene must not pair")
  }

  test("parseMp4 reads duration/resolution/frame count from box headers, no codec") {
    import java.nio.ByteBuffer
    def u32(v: Long): Array[Byte] = ByteBuffer.allocate(4).putInt(v.toInt).array()
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      u32(payload.length + 8L) ++ t.getBytes("ISO-8859-1") ++ payload
    // a structurally valid ISO-BMFF tree: ftyp + moov(mvhd,
    // trak(tkhd, mdia(hdlr, minf(stbl(stsz))))) + mdat
    val ftyp = box("ftyp",
      "isom".getBytes("ISO-8859-1") ++ u32(0x200) ++
        "isomiso2".getBytes("ISO-8859-1"))
    // mvhd v0: ver/flags, creation, modification, timescale=1000,
    // duration=2500 ticks (= 2.5 s), padded to the spec's 100 bytes
    val mvhd = box("mvhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++ u32(2500) ++
        new Array[Byte](80))
    // tkhd v0: width/height are 16.16 fixed at offsets 76/80
    val tkhd = box("tkhd",
      new Array[Byte](76) ++ u32(640L << 16) ++ u32(360L << 16))
    val hdlr = box("hdlr",
      u32(0) ++ u32(0) ++ "vide".getBytes("ISO-8859-1") ++
        new Array[Byte](12))
    // stsz: uniform sample size 0 → per-sample table, 75 samples
    val stsz = box("stsz", u32(0) ++ u32(0) ++ u32(75))
    val mdia = box("mdia", hdlr ++ box("minf", box("stbl", stsz)))
    val moov = box("moov", mvhd ++ box("trak", tkhd ++ mdia))
    val mp4 = ftyp ++ moov ++ box("mdat", new Array[Byte](64))

    val meta = Media.parseMp4(mp4)
    assert(meta === Some(Media.Mp4Meta("isom", 2500L, 640, 360, 75L)))
    // not ISO-BMFF -> None, never a garbage parse
    assert(Media.parseMp4("plain text payload".getBytes("UTF-8")).isEmpty)
    assert(Media.parseMp4(Array.empty[Byte]).isEmpty)
    // truncated container: the walk stops at the malformed size
    // instead of throwing
    assert(Media.parseMp4(mp4.take(40)).map(_.brand) === Some("isom"))

    // the distributed face keeps only parseable rows
    import spark.implicits._
    val media = Seq((1L, mp4), (2L, "not a video".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val rows = Media.videoMeta(spark, media).collect()
    assert(rows.length === 1)
    assert(rows(0).getLong(0) === 1L && rows(0).getLong(2) === 2500L &&
      rows(0).getInt(3) === 640 && rows(0).getInt(4) === 360 &&
      rows(0).getLong(5) === 75L)
  }
}

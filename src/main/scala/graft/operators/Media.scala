package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal columns (SURVEY.md §2.6): image/audio/video payloads
  * travel as opaque `binary` columns with a typed metadata struct.
  *
  * Image decode is REAL for the formats the JDK ships codecs for
  * (PNG/BMP/GIF/JPEG via `javax.imageio`), and audio decode is REAL
  * for WAV/AIFF/AU (PCM via `javax.sound.sampled`) — zero extra
  * dependencies. `decode` tries ImageIO, then the audio reader, and
  * only payloads no JDK codec understands (video/exotic formats) fall
  * back to the deterministic byte-level `decodeStub`, preserving the
  * batch shape so a real codec swap changes only that body. Frame
  * sampling decodes REAL frames for multi-frame containers the JDK
  * reads (animated GIF, via `decodeFrames`); only codec-less video
  * containers (MP4 etc.) remain on the byte-chunk stub.
  *
  * At scale the pattern is: binary payloads stay columnar in parquet,
  * decode runs in `mapPartitions` (one codec context per partition,
  * not per row), and derived features land in normal columns where
  * Catalyst can prune/push down.
  */
object Media {

  /** Decoded raster: dimensions + packed RGB bytes (3 per pixel). */
  case class DecodedImage(width: Int, height: Int, rgb: Array[Byte])

  /** Build the media table: payload as binary + typed metadata. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        expr("octet_length(text)").as("byte_len"),
        lit("text/plain").as("mime"),
        expr("substring(md5(cast(text as binary)), 1, 8)").as("sig")).as("meta"))

  /** STUB decoder for payloads no JDK codec reads (video — images and
    * PCM audio decode for real above): deterministic byte map so tests
    * are stable. A real deployment swaps the body for the codec call;
    * everything around it is unchanged. */
  def decodeStub(payload: Array[Byte]): Array[Byte] =
    payload.map(b => (b ^ 0x5a).toByte)

  /** Packed sRGB bytes of a decoded raster — read through getRGB, so
    * the output layout is identical whatever the file's internal
    * color model (palette GIF, gray PNG, ...). */
  private def rasterRgb(im: java.awt.image.BufferedImage): Array[Byte] = {
    val (w, h) = (im.getWidth, im.getHeight)
    val out = new Array[Byte](w * h * 3)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = im.getRGB(x, y)
        out(i) = (rgb >> 16).toByte
        out(i + 1) = (rgb >> 8).toByte
        out(i + 2) = rgb.toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** REAL image decode via javax.imageio (PNG/BMP/GIF/JPEG ship with
    * the JDK). Returns None when no installed codec recognizes the
    * bytes. */
  def decodeImage(payload: Array[Byte]): Option[DecodedImage] = {
    // JDK codecs throw more than IOException on malformed input
    // (CMMException for corrupt ICC profiles, IllegalArgument/
    // ArrayIndexOutOfBounds from truncated GIF/BMP) — any of them
    // means "not decodable", never a failed task
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map(im => DecodedImage(im.getWidth, im.getHeight, rasterRgb(im)))
  }

  /** One decoded frame of a multi-frame container. */
  case class DecodedFrame(frameNo: Int, width: Int, height: Int,
    rgb: Array[Byte])

  /** REAL multi-frame decode via javax.imageio's sequence API
    * (ImageReader.getNumImages/read(i)): the JDK GIF codec reads every
    * frame of an animated GIF, so frame sampling operates on real
    * frames for that container. Frames come back as raw per-frame
    * rasters — an optimized GIF's later frames may be smaller than the
    * logical screen (deterministic and exactly what the file stores);
    * disposal-method compositing is a presentation concern, not an
    * analytics one. Nil when no installed reader recognizes the bytes.
    * Payloads in genuinely codec-less containers (MP4 etc.) keep the
    * byte-chunk stub in frameSample. */
  def decodeFrames(payload: Array[Byte]): Seq[DecodedFrame] = {
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (iis == null) return Nil
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Nil
      val reader = readers.next()
      try {
        // seekForwardOnly = false: getNumImages(allowSearch) walks the
        // whole stream to count frames
        reader.setInput(iis, false, true)
        val n =
          try reader.getNumImages(true)
          catch { case scala.util.control.NonFatal(_) => -1 }
        (0 until math.max(n, 0)).flatMap { i =>
          try {
            val im = reader.read(i)
            Some(DecodedFrame(i, im.getWidth, im.getHeight, rasterRgb(im)))
          } catch { case scala.util.control.NonFatal(_) => None }
        }
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Decoded audio: format metadata + raw PCM bytes as stored. */
  case class DecodedAudio(sampleRate: Float, channels: Int, bits: Int,
    frames: Long, bigEndian: Boolean, unsigned: Boolean, pcm: Array[Byte])

  /** REAL audio decode via javax.sound.sampled (WAV/AIFF/AU/SND ship
    * with the JDK). Returns None when no installed reader recognizes
    * the bytes. The stream is drained through a bounded buffer —
    * payloads are row-sized by construction (they arrived as one
    * binary cell), so materializing the PCM mirrors what the image
    * path does with its raster. */
  def decodeAudio(payload: Array[Byte]): Option[DecodedAudio] = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1 << 14)
        var n = ais.read(buf)
        while (n >= 0) {
          if (n > 0) out.write(buf, 0, n)
          n = ais.read(buf)
        }
        Some(DecodedAudio(fmt.getSampleRate, fmt.getChannels,
          fmt.getSampleSizeInBits, ais.getFrameLength, fmt.isBigEndian,
          fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
          out.toByteArray))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The decode step every feature extractor runs: real ImageIO decode
    * when a JDK image codec matches, real PCM decode when an audio
    * reader matches, deterministic stub otherwise (video — the JDK
    * ships no codec). */
  def decode(payload: Array[Byte]): Array[Byte] =
    decodeImage(payload).map(_.rgb)
      .orElse(decodeAudio(payload).map(_.pcm))
      .getOrElse(decodeStub(payload))

  /** Audio metadata + signal features over the REAL decoded PCM —
    * (doc_id, sample_rate, channels, bits, n_frames, duration_ms,
    * rms, peak); payloads no audio reader accepts yield nulls,
    * keeping the pipeline total. Samples are normalized to [-1, 1]
    * from the container's own width/endianness/signedness, so the
    * features are container-independent. */
  def audioFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          decodeAudio(payload) match {
            case Some(a) if a.bits == 8 || a.bits == 16 =>
              val bytesPer = a.bits / 8
              val nSamples = a.pcm.length / bytesPer
              var i = 0
              var sumSq = 0.0
              var peak = 0.0
              while (i < nSamples) {
                val raw =
                  if (bytesPer == 1)
                    (if (a.unsigned) (a.pcm(i) & 0xff) - 128
                     else a.pcm(i).toInt).toDouble / 128.0
                  else {
                    val (b0, b1) = (a.pcm(i * 2) & 0xff, a.pcm(i * 2 + 1) & 0xff)
                    val v = if (a.bigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
                    (if (v >= 32768) v - 65536 else v).toDouble / 32768.0
                  }
                sumSq += raw * raw
                if (math.abs(raw) > peak) peak = math.abs(raw)
                i += 1
              }
              val durMs = a.frames * 1000.0 / a.sampleRate
              (id, Some(a.sampleRate.toDouble), Some(a.channels), Some(a.bits),
                Some(a.frames), Some(durMs),
                Some(math.sqrt(sumSq / math.max(nSamples, 1))), Some(peak))
            case _ => (id, None, None, None, None, None, None, None)
          }
        }
      }.toDF("doc_id", "sample_rate", "channels", "bits", "n_frames",
        "duration_ms", "rms", "peak")
  }

  /** Audio fingerprint over the REAL decoded PCM: the signal splits
    * into 64 equal windows, each window's energy is the EXACT integer
    * sum of squared samples (16-bit samples: each square < 2^30, a
    * window of a row-sized payload can't overflow a long), and bit i
    * says "window i+1 is louder than window i" — the energy-envelope
    * signature (a Shazam-style fingerprint reduced to its
    * integer-exact core). Loudness scaling changes energies but not
    * most comparisons; re-containering (WAV↔AIFF of the same PCM)
    * changes neither, so audio near-dup is hamming distance on longs —
    * completing the text/image/audio content-dedup trio. Pure integer
    * arithmetic ⇒ bit-identical everywhere. Null for non-audio. */
  def audioFingerprint(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val fp = decodeAudio(payload).collect {
            case a if a.bits == 8 || a.bits == 16 =>
              val bytesPer = a.bits / 8
              val nSamples = a.pcm.length / bytesPer
              if (nSamples < 65) None
              else {
                def sample(i: Int): Long =
                  if (bytesPer == 1)
                    (if (a.unsigned) (a.pcm(i) & 0xff) - 128
                     else a.pcm(i).toInt).toLong
                  else {
                    val (b0, b1) = (a.pcm(i * 2) & 0xff, a.pcm(i * 2 + 1) & 0xff)
                    val v = if (a.bigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
                    (if (v >= 32768) v - 65536 else v).toLong
                  }
                val energy = new Array[Long](65)
                var w = 0
                while (w < 65) {
                  // Long arithmetic: w*nSamples overflows Int at ~33M
                  // samples (~67 MB of 16-bit PCM)
                  val from = (w.toLong * nSamples / 65).toInt
                  val until = ((w + 1).toLong * nSamples / 65).toInt
                  var e = 0L
                  var i = from
                  while (i < until) { val s = sample(i); e += s * s; i += 1 }
                  energy(w) = e
                  w += 1
                }
                var bits = 0L
                var i = 0
                while (i < 64) {
                  if (energy(i + 1) > energy(i)) bits |= (1L << i)
                  i += 1
                }
                Some(bits)
              }
          }.flatten
          (id, fp)
        }
      }.toDF("doc_id", "afp")
  }

  /** Image metadata + channel means over the REAL decoded pixels —
    * (doc_id, width, height, mean_r, mean_g, mean_b); undecodable
    * payloads yield nulls, keeping the pipeline total. Exact integer
    * sums + one division per channel. */
  def imageFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          decodeImage(payload) match {
            case Some(im) =>
              val sums = new Array[Long](3)
              var i = 0
              while (i < im.rgb.length) {
                sums(i % 3) += im.rgb(i) & 0xff
                i += 1
              }
              val n = (im.width.toLong * im.height).max(1L)
              (id, Some(im.width), Some(im.height),
                Some(sums(0).toDouble / n), Some(sums(1).toDouble / n),
                Some(sums(2).toDouble / n))
            case None => (id, None, None, None, None, None)
          }
        }
      }.toDF("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")
  }

  /** REAL image resize: deterministic nearest-neighbor down/upsample
    * of the decoded raster to (tw × th) — no AWT rendering involved,
    * so results are bit-stable across JVMs. Output is the raw RGB
    * raster (binary column), the shape a feature model consumes. */
  def imageResize(spark: SparkSession, media: DataFrame,
    tw: Int = 8, th: Int = 8): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          decodeImage(payload).map { im =>
            val out = new Array[Byte](tw * th * 3)
            var j = 0
            var y = 0
            while (y < th) {
              val sy = y * im.height / th
              var x = 0
              while (x < tw) {
                val sx = x * im.width / tw
                val src = (sy * im.width + sx) * 3
                out(j) = im.rgb(src); out(j + 1) = im.rgb(src + 1); out(j + 2) = im.rgb(src + 2)
                j += 3; x += 1
              }
              y += 1
            }
            (id, tw, th, out)
          }
        }
      }.toDF("doc_id", "width", "height", "pixels")
  }

  /** Perceptual image hash (aHash): decode → nearest-neighbor 8×8
    * gray raster → threshold each cell against the mean → one 64-bit
    * hash per image. Visually-identical content maps to identical or
    * near-identical bits whatever the encoding (PNG vs GIF of the same
    * scene, recompressions, small edits), so IMAGE near-dup reduces to
    * hamming distance on longs — the content-addressed dedup step a
    * multimodal corpus needs beyond byte-level md5. Integer-only
    * arithmetic on the decoded raster ⇒ bit-stable across JVMs.
    * Undecodable payloads yield null (never a fake hash). */
  def perceptualHash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val h = decodeImage(payload).map { im =>
            val gray = new Array[Long](64)
            var y = 0
            while (y < 8) {
              val sy = y * im.height / 8
              var x = 0
              while (x < 8) {
                val sx = x * im.width / 8
                val src = (sy * im.width + sx) * 3
                gray(y * 8 + x) = ((im.rgb(src) & 0xff) +
                  (im.rgb(src + 1) & 0xff) + (im.rgb(src + 2) & 0xff)) / 3L
                x += 1
              }
              y += 1
            }
            val mean = gray.sum / 64L
            var bits = 0L
            var i = 0
            while (i < 64) {
              if (gray(i) > mean) bits |= (1L << i)
              i += 1
            }
            bits
          }
          (id, h)
        }
      }.toDF("doc_id", "phash")
  }

  /** Image near-dup pairs by perceptual hash: pigeonhole-blocked — a
    * pair within hamming distance ≤ 3 must agree on at least one of
    * the four 16-bit hash blocks, so candidates come from four
    * block-equality joins (bucket-local, never all-pairs; the same
    * blocking the simhash text path uses), then the exact
    * `bit_count(xor)` residual keeps true near-dups. */
  def imageNearDupPairs(spark: SparkSession, media: DataFrame,
    maxHamming: Int = 3): DataFrame = {
    val hashed = perceptualHash(spark, media).filter(col("phash").isNotNull)
    val blocked = hashed.select(col("doc_id"), col("phash"),
      explode(expr("transform(sequence(0, 3), b -> " +
        "struct(b AS b, shiftright(phash, b * 16) & 65535 AS blk))")).as("x"))
      .select(col("doc_id"), col("phash"), col("x.b").as("b"), col("x.blk").as("blk"))
    val a = blocked.select(col("b"), col("blk"),
      col("doc_id").as("doc_a"), col("phash").as("ha"))
    val bb = blocked.select(col("b"), col("blk"),
      col("doc_id").as("doc_b"), col("phash").as("hb"))
    a.join(bb, Seq("b", "blk"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(expr(s"bit_count(ha ^ hb) <= $maxHamming"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(ha ^ hb)").as("hamming"))
      .distinct()
  }

  /** Per-partition feature extraction: one "codec context" per
    * partition, batched over rows — the mapPartitions shape a real
    * decoder needs. Emits a 256-bin byte histogram as the feature. */
  def byteHistogram(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // expensive init (codec/model load) would happen once here
        rows.map { case (id, payload) =>
          val decoded = decode(payload)
          val hist = new Array[Long](256)
          decoded.foreach(b => hist(b & 0xff) += 1)
          (id, hist)
        }
      }.toDF("doc_id", "hist")
  }

  /** Frame sampling: REAL frames when a JDK multi-frame codec reads
    * the payload (animated GIF via decodeFrames — each kept frame is
    * its raw RGB raster), byte-chunk "frames" otherwise (the one
    * remaining stub: containers the JDK has no codec for). Keeps every
    * `stride`-th frame; partition-preserving explode either way, the
    * shape a video pipeline's sampler has at scale. */
  def frameSample(spark: SparkSession, media: DataFrame,
    chunk: Int = 256, stride: Int = 2): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val real = decodeFrames(payload)
          val frames: Iterator[(Int, Array[Byte])] =
            if (real.nonEmpty) real.iterator.map(f => (f.frameNo, f.rgb))
            else if (payload.isEmpty) Iterator((0, Array.empty[Byte]))
            else payload.grouped(chunk).zipWithIndex.map(_.swap)
          frames.filter(_._1 % stride == 0)
            .map { case (i, f) => (id, i, f) }
        }
      }.toDF("doc_id", "frame_no", "frame")
  }

  /** Resize stub: decimate the payload by `factor` (keep every
    * factor-th byte) — the downsample shape of an image resize, run
    * per-partition like the decoder. Output stays a binary column. */
  def resize(spark: SparkSession, media: DataFrame, factor: Int = 4): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val out = new Array[Byte]((payload.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = payload(i * factor); i += 1 }
          (id, out)
        }
      }.toDF("doc_id", "resized")
  }

  /** Feature-extraction stub: decoded payload → L2-normalized 16-dim
    * embedding (nibble-bucket frequencies). The output column has the
    * exact shape the Similarity operators consume (`Array[Float]`), so
    * the media pipeline composes with ANN search end-to-end — a real
    * model swap changes only the function body. */
  def extractEmbedding(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // model/codec load would happen once per partition here
        rows.map { case (id, payload) =>
          val decoded = decode(payload)
          val hist = new Array[Float](16)
          decoded.foreach(b => hist(b & 0xf) += 1f)
          val n = math.sqrt(hist.map(x => x.toDouble * x).sum).toFloat max 1e-9f
          (id, hist.map(_ / n))
        }
      }.toDF("vec_id", "embedding")
  }

  /** Parsed MP4 container facts (no decoding anywhere). */
  case class Mp4Meta(brand: String, durationMs: Long, width: Int,
    height: Int, nFrames: Long)

  /** MP4 / ISO-BMFF container metadata by BOX-HEADER PARSING — never
    * decoding (no codec in the loop, so it runs wherever the bytes
    * do): walks the `[size][type]` box tree for
    *   ftyp (major brand), moov/mvhd (timescale + duration →
    *   duration_ms), the video trak's tkhd (width/height, 16.16
    *   fixed), and its stbl/stsz (sample count = frame count).
    * The video track is the trak whose mdia/hdlr handler is 'vide'.
    * Returns None for anything that isn't structurally ISO-BMFF —
    * detection is the ftyp box at offset 4, same rule the gated
    * `container` column applies in SQL. This is the metadata a video
    * curation pipeline filters on (duration/resolution/fps bands)
    * before paying for a single decoded frame. */
  def parseMp4(payload: Array[Byte]): Option[Mp4Meta] = {
    def u32(o: Int): Long =
      if (o + 4 > payload.length) -1L
      else ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
        ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def typ(o: Int): String =
      if (o + 4 > payload.length) ""
      else new String(payload, o, 4, "ISO-8859-1")
    // walk the child boxes of [from, to), calling f(boxType,
    // payloadStart, payloadEnd); malformed sizes end the walk
    def boxes(from: Int, to: Int)(f: (String, Int, Int) => Unit): Unit = {
      var o = from
      while (o + 8 <= to) {
        val size0 = u32(o)
        val t = typ(o + 4)
        val (hdr, size) =
          if (size0 == 1L) (16, u64(o + 8)) // 64-bit largesize
          else if (size0 == 0L) (8, (to - o).toLong) // "to end of file"
          else (8, size0)
        if (size < hdr || o + size > to) return
        f(t, o + hdr, o + size.toInt)
        o += size.toInt
      }
    }
    if (payload.length < 12 || typ(4) != "ftyp") return None
    var brand = ""
    var timescale = 0L
    var duration = 0L
    var width = 0
    var height = 0
    var nFrames = 0L
    boxes(0, payload.length) { (t, s, e) =>
      t match {
        case "ftyp" => brand = typ(s)
        case "moov" =>
          boxes(s, e) { (t2, s2, e2) =>
            t2 match {
              case "mvhd" =>
                val v = payload(s2) & 0xff
                if (v == 1) { timescale = u32(s2 + 20); duration = u64(s2 + 24) }
                else { timescale = u32(s2 + 12); duration = u32(s2 + 16) }
              case "trak" =>
                var w = 0; var h = 0; var frames = 0L; var isVideo = false
                boxes(s2, e2) { (t3, s3, e3) =>
                  t3 match {
                    case "tkhd" =>
                      val v = payload(s3) & 0xff
                      val off = if (v == 1) s3 + 88 else s3 + 76
                      w = (u32(off) >> 16).toInt      // 16.16 fixed
                      h = (u32(off + 4) >> 16).toInt
                    case "mdia" => boxes(s3, e3) { (t4, s4, e4) =>
                      t4 match {
                        case "hdlr" => isVideo = typ(s4 + 8) == "vide"
                        case "minf" => boxes(s4, e4) { (t5, s5, e5) =>
                          if (t5 == "stbl") boxes(s5, e5) { (t6, s6, _) =>
                            if (t6 == "stsz") frames = u32(s6 + 8)
                          }
                        }
                        case _ => ()
                      }
                    }
                    case _ => ()
                  }
                }
                if (isVideo) { width = w; height = h; nFrames = frames }
              case _ => ()
            }
          }
        case _ => ()
      }
    }
    val durMs = if (timescale > 0) duration * 1000L / timescale else 0L
    Some(Mp4Meta(brand, durMs, width, height, nFrames))
  }

  /** Video container metadata over a media frame — the distributed
    * face of `parseMp4`: one map-side pass, rows that don't parse are
    * dropped (they aren't videos). */
  def videoMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        parseMp4(payload).map(m =>
          (id, m.brand, m.durationMs, m.width, m.height, m.nFrames))
      }
      .toDF("doc_id", "brand", "duration_ms", "width", "height", "n_frames")
  }

  /** Structurally valid minimal ISO-BMFF writer — the inverse of
    * `parseMp4` for tests and the synthetic-video gate: ftyp +
    * moov(mvhd, trak(tkhd, mdia(hdlr, minf(stbl(stsz))))) + mdat.
    * Timescale 1000, so `durationTicks` is milliseconds. */
  def buildMp4(durationTicks: Long, width: Int, height: Int,
    nFrames: Long, mdat: Array[Byte]): Array[Byte] = {
    def u32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def ascii(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      u32(payload.length + 8L) ++ ascii(t) ++ payload
    val ftyp = box("ftyp", ascii("isom") ++ u32(0x200) ++ ascii("isomiso2"))
    val mvhd = box("mvhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++ u32(durationTicks) ++
        new Array[Byte](80))
    val tkhd = box("tkhd",
      new Array[Byte](76) ++ u32(width.toLong << 16) ++
        u32(height.toLong << 16))
    val hdlr = box("hdlr",
      u32(0) ++ u32(0) ++ ascii("vide") ++ new Array[Byte](12))
    val stsz = box("stsz", u32(0) ++ u32(0) ++ u32(nFrames))
    val mdia = box("mdia", hdlr ++ box("minf", box("stbl", stsz)))
    val moov = box("moov", mvhd ++ box("trak", tkhd ++ mdia))
    ftyp ++ moov ++ box("mdat", mdat)
  }

  /** ORACLE-GATED container-parsing exercise (q_video_meta): wrap
    * every document's bytes in a synthetic-but-structurally-real MP4
    * whose header facts derive deterministically from the row
    * (duration = doc_id-based ms, resolution banded by doc_id,
    * frame count from the text length), then recover them with the
    * box-header walk. The DuckDB oracle computes the same facts from
    * the raw row — hash equality proves `parseMp4` reads exactly
    * what the container declares, end-to-end and distributed, with
    * no codec anywhere. */
  def videoMetaGateQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val dur = (id % 3600) + 1
        val band = (id % 4).toInt
        val frames = text.getBytes("UTF-8").length % 500 + 1
        (id, buildMp4(dur, 320 + band * 160, 180 + band * 90, frames,
          text.getBytes("UTF-8")))
      }
      .toDF("doc_id", "payload")
    videoMeta(spark, payloads)
      .select(col("doc_id"), col("brand"), col("duration_ms"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("n_frames"))
  }

  /** Oracle-checkable metadata projection (q_media_meta). The
    * `container` column is the same structural sniff `parseMp4`
    * gates on (ftyp box at offset 4), expressed portably so the
    * DuckDB oracle replays it. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"),
      col("meta.byte_len").as("byte_len"),
      col("meta.sig").as("sig"),
      expr("(meta.byte_len + 255) div 256").as("n_chunks"),
      expr("CASE WHEN substring(cast(payload AS string), 5, 4) = 'ftyp' " +
        "THEN 'mp4' ELSE 'raw' END").as("container"))
}
